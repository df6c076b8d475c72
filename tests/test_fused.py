"""The fused serving pipeline must agree with the composable
processors it shortcuts."""

import numpy as np
import pytest

import jax.numpy as jnp

from shennong_tpu.ops import mel as melmod
from shennong_tpu.ops.framing import num_frames
from shennong_tpu.ops.pitch import (
    PitchOpts, ProcessPitchOpts, num_pitch_frames)
from shennong_tpu.ops.spectral import MfccOpts
from shennong_tpu.parallel.fused import mfcc_pitch_pipeline


def test_fused_matches_processors(audio):
    """Fused MFCC+CMVN+delta+pitch equals the step-by-step path."""
    from shennong_tpu.processor import MfccProcessor, KaldiPitchProcessor
    from shennong_tpu.postprocessor import DeltaPostProcessor
    from shennong_tpu.processor.pitch_kaldi import KaldiPitchPostProcessor

    data = audio.data.astype(np.float32)
    nsamples = data.shape[0]
    signals = data[None, :]
    lengths = np.array([nsamples], dtype=np.int32)

    mfcc_opts = MfccOpts(frame=MfccOpts().frame.__class__(dither=0.0))
    pitch_opts = PitchOpts()
    post_opts = ProcessPitchOpts(delta_pitch_noise_stddev=0.0)
    mel_weights = melmod.mel_banks(
        23, 512, 16000.0, 20.0, 0.0, 100.0, -500.0, 1.0)[0]
    nframes_max = num_frames(nsamples, mfcc_opts.frame)
    pitch_frames_max = num_pitch_frames(nsamples, pitch_opts)

    fused, out_frames = mfcc_pitch_pipeline(
        jnp.asarray(signals), jnp.asarray(lengths),
        jnp.asarray(mel_weights), mfcc_opts, pitch_opts, post_opts,
        nframes_max, pitch_frames_max)
    fused = np.asarray(fused[0, :int(out_frames[0])])

    # reference path: processors chained on host
    mfcc = MfccProcessor(dither=0).process(audio)
    normalized = (mfcc.data - mfcc.data.mean(axis=0)) / np.sqrt(
        np.maximum(mfcc.data.var(axis=0), 1e-20))
    from shennong_tpu import Features
    delta = DeltaPostProcessor().process(
        Features(normalized, mfcc.times))

    pitch = KaldiPitchProcessor().process(audio)
    pitch_post = KaldiPitchPostProcessor(
        delta_pitch_noise_stddev=0).process(pitch)

    common = min(delta.nframes, pitch_post.nframes, fused.shape[0])
    expected = np.hstack(
        [delta.data[:common], pitch_post.data[:common]])

    assert fused.shape[1] == expected.shape[1] == 42
    assert np.max(np.abs(fused[:common] - expected)) < 2e-3


def test_fused_sharded_over_mesh():
    """The fused pipeline runs data-parallel over the 8-device mesh
    and matches the single-device result."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    from shennong_tpu.parallel import data_mesh
    from tests.conftest import make_speech_like_signal

    mesh = data_mesh(jax.devices())
    assert mesh.devices.size == 8

    batch, nsamples, rate = 8, 16000, 16000
    signals = np.stack([
        make_speech_like_signal(nsamples, rate).astype(np.float32)
        + i for i in range(batch)])
    lengths = np.full(batch, nsamples, dtype=np.int32)

    # dither=0: the sharded and single-device runs must be
    # deterministic to compare (a non-zero dither now requires a
    # PRNG key by contract)
    mfcc_opts, pitch_opts, post_opts = (
        MfccOpts(frame=MfccOpts().frame.__class__(dither=0.0)),
        PitchOpts(), ProcessPitchOpts())
    mel_weights = melmod.mel_banks(
        23, mfcc_opts.frame.padded_window_size, float(rate),
        20.0, 0.0, 100.0, -500.0, 1.0)[0]
    fmax = num_frames(nsamples, mfcc_opts.frame)
    pmax = num_pitch_frames(nsamples, pitch_opts)

    def run(signals_dev, lengths_dev):
        return mfcc_pitch_pipeline(
            signals_dev, lengths_dev, jnp.asarray(mel_weights),
            mfcc_opts, pitch_opts, post_opts, fmax, pmax)[0]

    plain = np.asarray(run(jnp.asarray(signals), jnp.asarray(lengths)))

    sharding = NamedSharding(mesh, PartitionSpec('data'))
    sharded_out = run(
        jax.device_put(signals, sharding),
        jax.device_put(lengths, sharding))
    assert len(sharded_out.sharding.device_set) == 8
    assert np.allclose(np.asarray(sharded_out), plain, atol=1e-5)


def test_gmm_training_step_with_dither_takes_key():
    """A dithered MfccOpts changes make_gmm_training_step's contract:
    the returned step takes a trailing PRNG key (per-shard folded)
    instead of crashing at trace time; dither=0 keeps the key-less
    signature."""
    import jax
    from jax.sharding import Mesh

    from shennong_tpu.ops.framing import FrameOptions
    from shennong_tpu.parallel.fused import make_gmm_training_step

    mesh = Mesh(np.asarray(jax.devices()), ('data',))
    num_gauss, dim = 3, 13
    batch, nsamples = 8, 4000
    rng = np.random.RandomState(0)
    signals = jnp.asarray(
        (rng.randn(batch, nsamples) * 5000).astype(np.float32))
    lengths = jnp.asarray(np.full(batch, nsamples, np.int32))
    weights = jnp.asarray(np.full(num_gauss, 1 / num_gauss, np.float32))
    means = jnp.asarray(rng.randn(num_gauss, dim).astype(np.float32))
    inv_vars = jnp.asarray(np.ones((num_gauss, dim), np.float32))

    opts = MfccOpts(frame=FrameOptions(dither=1.0))
    fmax = num_frames(nsamples, opts.frame)
    step = make_gmm_training_step(mesh, opts, fmax)
    out = step(signals, lengths, weights, means, inv_vars,
               jax.random.PRNGKey(0))
    w1 = np.asarray(out[0])
    np.testing.assert_allclose(w1.sum(), 1.0, rtol=1e-5)
    assert np.all(np.isfinite(np.asarray(out[1])))

    # two different keys give (slightly) different statistics, the
    # same key reproduces them exactly
    again = step(signals, lengths, weights, means, inv_vars,
                 jax.random.PRNGKey(0))
    np.testing.assert_array_equal(w1, np.asarray(again[0]))
    other = step(signals, lengths, weights, means, inv_vars,
                 jax.random.PRNGKey(7))
    assert not np.array_equal(w1, np.asarray(other[0]))

    # undithered factory keeps the historical 5-argument signature
    quiet = MfccOpts(frame=FrameOptions(dither=0.0))
    step0 = make_gmm_training_step(mesh, quiet, fmax)
    out0 = step0(signals, lengths, weights, means, inv_vars)
    assert np.all(np.isfinite(np.asarray(out0[1])))
