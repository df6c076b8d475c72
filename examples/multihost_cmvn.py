#!/usr/bin/env python
"""Multi-process (multi-host) corpus CMVN with jax.distributed.

Each process extracts MFCCs for its shard of the utterances and the
corpus-level CMVN statistics reduce with a ``psum`` across processes
— the exact communication pattern of a multi-host TPU pod (per-host
shards over DCN, collectives over ICI/DCN).

Run standalone to simulate two hosts on one machine (each subprocess
gets its own CPU devices):

    python examples/multihost_cmvn.py

or run one process per real host with the standard coordinator
environment:

    python examples/multihost_cmvn.py --coordinator host0:8476 \\
        --num-processes 2 --process-id {0,1} utterances.txt
"""

import os
import sys

# allow running from a source checkout without installation
sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import argparse
import subprocess


def worker(args):
    import numpy as np

    import jax
    if args.coordinator and args.coordinator.startswith('127.0.0.1'):
        # local simulation: pin the CPU platform before any backend
        # initializes (a force-registered accelerator plugin would
        # otherwise grab the runtime ahead of the distributed join)
        jax.config.update('jax_platforms', 'cpu')

    from shennong_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id)
    if args.num_processes and jax.process_count() != args.num_processes:
        raise SystemExit(
            f'distributed join failed: {jax.process_count()} '
            f'processes instead of {args.num_processes}')

    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from shennong_tpu.ops import mel as melmod
    from shennong_tpu.ops.framing import FrameOptions, num_frames
    from shennong_tpu.ops.spectral import MfccOpts, mfcc_batch

    # each process computes the features of its utterance shard; here
    # the shard is synthesized per process for a self-contained demo
    rng = np.random.RandomState(args.process_id)
    batch, nsamples = 4, 8000
    signals = jnp.asarray(
        (rng.randn(batch, nsamples) * 5000).astype(np.float32))
    lengths = jnp.asarray(np.full(batch, nsamples, np.int32))

    # dither=0: a configured dither requires a PRNG key, and this
    # demo wants deterministic per-process features anyway
    opts = MfccOpts(frame=FrameOptions(dither=0.0))
    mel_weights = jnp.asarray(melmod.mel_banks(
        23, opts.frame.padded_window_size, 16000.0,
        20.0, 0.0, 100.0, -500.0, 1.0)[0])
    fmax = num_frames(nsamples, opts.frame)
    feats = mfcc_batch(signals, lengths, mel_weights, opts, fmax)

    # local sufficient statistics, then the cross-process reduction
    local = np.concatenate([
        [np.asarray(feats).reshape(-1, 13).shape[0]],
        np.asarray(feats).sum(axis=(0, 1)),
        (np.asarray(feats) ** 2).sum(axis=(0, 1))])
    total = np.asarray(multihost_utils.process_allgather(
        jnp.asarray(local, dtype=jnp.float32))).astype(
            np.float64).sum(axis=0)

    count, sums, sumsq = total[0], total[1:14], total[14:]
    mean = sums / count
    std = np.sqrt(np.maximum(sumsq / count - mean ** 2, 0))
    if args.process_id == 0:
        print(f'processes: {jax.process_count()}, '
              f'global frames: {int(count)}')
        print('global mean[:3]:', np.round(np.asarray(mean[:3]), 4))
        print('global std[:3]: ', np.round(np.asarray(std[:3]), 4))
    return 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--coordinator', default=None)
    parser.add_argument('--num-processes', type=int, default=None)
    parser.add_argument('--process-id', type=int, default=None)
    args = parser.parse_args()

    if args.process_id is not None:
        return worker(args)

    # launcher mode: spawn a 2-process local simulation
    env = dict(os.environ, JAX_PLATFORMS='cpu')
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             '--coordinator', '127.0.0.1:8476',
             '--num-processes', '2', '--process-id', str(i)],
            env=env)
        for i in range(2)]
    codes = [p.wait(timeout=300) for p in procs]
    if any(codes):
        raise SystemExit(f'worker failure: exit codes {codes}')
    print('multihost simulation OK')
    return 0


if __name__ == '__main__':
    sys.exit(main())
