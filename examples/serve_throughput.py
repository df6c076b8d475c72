#!/usr/bin/env python
"""Serving-style throughput demo of the fused extraction pipeline.

Runs the one-program MFCC + CMVN + delta + Kaldi-pitch pipeline
(:func:`shennong_tpu.parallel.fused.mfcc_pitch_pipeline`) the way a
feature service would: batches dispatched back to back, synchronized
once per measurement window, throughput reported as the real-time
factor.

    python examples/serve_throughput.py --batch 16 --seconds 5

On a TPU chip this sustains tens of thousands of times real-time; on
CPU it is a functional demo.
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument('--batch', type=int, default=16,
                        help='utterances per batch [%(default)s]')
    parser.add_argument('--seconds', type=float, default=5.0,
                        help='seconds per utterance [%(default)s]')
    parser.add_argument('--windows', type=int, default=3,
                        help='measurement windows [%(default)s]')
    parser.add_argument('--iterations', type=int, default=5,
                        help='batches per window [%(default)s]')
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from shennong_tpu.ops import mel as melmod
    from shennong_tpu.ops.framing import num_frames
    from shennong_tpu.ops.pitch import (
        PitchOpts, ProcessPitchOpts, num_pitch_frames)
    from shennong_tpu.ops.spectral import MfccOpts
    from shennong_tpu.parallel.fused import mfcc_pitch_pipeline
    from shennong_tpu.logger import get_logger
    from shennong_tpu.parallel.profiler import StageTimer

    rate = 16000
    nsamples = int(rate * args.seconds)
    rng = np.random.RandomState(0)
    t = np.arange(nsamples) / rate
    base = np.sin(2 * np.pi * 130 * t) * 8000

    mfcc_opts = MfccOpts()
    pitch_opts = PitchOpts()
    post_opts = ProcessPitchOpts()
    mel_weights = jax.device_put(melmod.mel_banks(
        23, mfcc_opts.frame.padded_window_size, float(rate),
        20.0, 0.0, 100.0, -500.0, 1.0)[0])
    nframes_max = num_frames(nsamples, mfcc_opts.frame)
    pitch_max = num_pitch_frames(nsamples, pitch_opts)
    lengths = jax.device_put(
        np.full(args.batch, nsamples, dtype=np.int32))

    def new_batch(seed):
        noise = rng.randn(args.batch, nsamples) * 50
        return jax.device_put(
            (base[None, :] + noise).astype(np.float32))

    timer = StageTimer(log=get_logger('serve', 'info'))
    with timer.stage('compile + first batch'):
        out, _ = mfcc_pitch_pipeline(
            new_batch(0), lengths, mel_weights, mfcc_opts,
            pitch_opts, post_opts, nframes_max, pitch_max,
            key=jax.random.PRNGKey(0))
        np.asarray(out[0, 0])

    # jitted probes: eager stacking ops synchronize with remote
    # device transports once per op, which would bill several relay
    # round trips to the timed window
    stage_probe = jax.jit(
        lambda xs: jnp.stack([x[0, 0] for x in xs]).sum())
    out_probe = jax.jit(
        lambda xs: jnp.stack([x[0, 0, 0] for x in xs]).sum())

    for window in range(args.windows):
        batches = [new_batch(i) for i in range(args.iterations)]
        # make sure the host->device staging is complete: the window
        # measures extraction throughput, not the input link
        np.asarray(stage_probe(batches))
        keys = [
            jax.random.PRNGKey(window * args.iterations + i)
            for i in range(len(batches))]
        start = time.perf_counter()
        outs = [
            mfcc_pitch_pipeline(
                signals, lengths, mel_weights, mfcc_opts,
                pitch_opts, post_opts, nframes_max, pitch_max,
                key=key)[0]
            for signals, key in zip(batches, keys)]
        # synchronize through a host fetch depending on every output
        np.asarray(out_probe(outs))
        elapsed = time.perf_counter() - start
        audio = args.batch * args.seconds * args.iterations
        print(f'window {window}: {audio / elapsed:10.0f}x real-time '
              f'({elapsed * 1000 / args.iterations:.1f} ms/batch, '
              f'{jax.default_backend()})')

    timer.report()


if __name__ == '__main__':
    main()
