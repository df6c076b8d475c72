"""Randomized option fuzzing against the Kaldi oracles.

Each case draws a random (but valid) option combination and a fresh
random signal, then checks the JAX computers against the literal
per-frame oracles. Complements the curated option sweeps with
coverage of interactions.
"""

import numpy as np
import pytest

from shennong_tpu.audio import Audio
from shennong_tpu.processor import MfccProcessor, PlpProcessor

from tests import kaldi_oracle


def _random_signal(rng, nsamples=6000, rate=16000):
    t = np.arange(nsamples) / rate
    f0 = rng.uniform(80, 250)
    sig = sum(
        rng.uniform(0.1, 1.0) * np.sin(2 * np.pi * f0 * (k + 1) * t)
        for k in range(4))
    sig += rng.randn(nsamples) * 0.05
    sig = sig / np.abs(sig).max() * rng.uniform(0.2, 0.9)
    return (sig * 2 ** 15 * 0.9).astype(np.int16)


@pytest.mark.parametrize('seed', range(8))
def test_mfcc_fuzz(seed):
    rng = np.random.RandomState(seed)
    audio = Audio(_random_signal(rng), 16000)

    kwargs = dict(
        dither=0,
        frame_shift=float(rng.choice([0.008, 0.01, 0.015])),
        frame_length=float(rng.choice([0.02, 0.025, 0.032])),
        preemph_coeff=float(rng.choice([0.0, 0.9, 0.97])),
        remove_dc_offset=bool(rng.randint(2)),
        window_type=str(rng.choice(
            ['povey', 'hamming', 'hanning', 'blackman'])),
        snip_edges=bool(rng.randint(2)),
        num_bins=int(rng.choice([15, 23, 30])),
        low_freq=float(rng.choice([20, 60, 120])),
        high_freq=float(rng.choice([0, -200, 7000])),
        num_ceps=int(rng.choice([10, 13])),
        use_energy=bool(rng.randint(2)),
        raw_energy=bool(rng.randint(2)),
        cepstral_lifter=float(rng.choice([0.0, 22.0])),
        htk_compat=bool(rng.randint(2)))

    ours = MfccProcessor(**kwargs).process(audio).data
    ref = kaldi_oracle.mfcc(
        audio.data.astype(np.float64),
        shift_s=kwargs['frame_shift'], length_s=kwargs['frame_length'],
        preemph=kwargs['preemph_coeff'],
        remove_dc=kwargs['remove_dc_offset'],
        window_type=kwargs['window_type'],
        snip_edges=kwargs['snip_edges'], num_bins=kwargs['num_bins'],
        low=kwargs['low_freq'], high=kwargs['high_freq'],
        num_ceps=kwargs['num_ceps'], use_energy=kwargs['use_energy'],
        raw_energy=kwargs['raw_energy'],
        cepstral_lifter=kwargs['cepstral_lifter'],
        htk_compat=kwargs['htk_compat'])
    assert ours.shape == ref.shape, kwargs
    assert np.max(np.abs(ours - ref)) < 1e-3, kwargs


@pytest.mark.parametrize('seed', range(4))
def test_plp_fuzz(seed):
    rng = np.random.RandomState(100 + seed)
    audio = Audio(_random_signal(rng), 16000)

    kwargs = dict(
        dither=0,
        rasta=bool(rng.randint(2)),
        num_bins=int(rng.choice([17, 23])),
        lpc_order=int(rng.choice([10, 12])),
        use_energy=bool(rng.randint(2)),
        compress_factor=float(rng.choice([1 / 3, 0.25])),
        cepstral_lifter=float(rng.choice([0.0, 22.0])))
    kwargs['num_ceps'] = int(
        rng.randint(5, kwargs['lpc_order'] + 2))

    ours = PlpProcessor(**kwargs).process(audio).data
    ref = kaldi_oracle.plp(
        audio.data.astype(np.float64),
        rasta=kwargs['rasta'], num_bins=kwargs['num_bins'],
        lpc_order=kwargs['lpc_order'], num_ceps=kwargs['num_ceps'],
        use_energy=kwargs['use_energy'],
        compress=kwargs['compress_factor'],
        cepstral_lifter=kwargs['cepstral_lifter'])
    assert ours.shape == ref.shape, kwargs
    assert np.max(np.abs(ours - ref)) < 1e-3, kwargs


@pytest.mark.parametrize('seed', range(4))
def test_pitch_fuzz(seed):
    """Random pitch option combinations against the literal oracle:
    every lag decision identical, or — would a rare float32 cost tie
    appear — provably a tie (the float64 min-cost path through our lag
    within 1e-4 of the optimum).

    Note the reference computes in float32 too (Kaldi ``BaseFloat``),
    so tie-side choices are implementation-defined there as well; an
    exact-decision contract against the float64 oracle is *stronger*
    than what two Kaldi builds guarantee each other. Measured over 24
    seeds: 0 disagreements in 1392 frames.
    """
    import jax.numpy as jnp
    from shennong_tpu.ops.pitch import (
        PitchOpts, compute_pitch, num_pitch_frames)

    from tests import pitch_oracle

    rng = np.random.RandomState(200 + seed)
    sig = _random_signal(rng, nsamples=9600).astype(np.float64)

    kwargs = dict(
        min_f0=float(rng.choice([50.0, 80.0])),
        max_f0=float(rng.choice([300.0, 400.0])),
        soft_min_f0=float(rng.choice([5.0, 10.0])),
        penalty_factor=float(rng.choice([0.05, 0.1, 0.2])),
        delta_pitch=float(rng.choice([0.005, 0.01])),
        nccf_ballast=float(rng.choice([1000.0, 7000.0])))

    opts = PitchOpts(**kwargs)
    fmax = num_pitch_frames(9600, opts)
    ours = np.asarray(compute_pitch(
        jnp.asarray(sig[None].astype(np.float32)),
        jnp.asarray([9600], np.int32), opts, fmax))[0]
    ref = pitch_oracle.compute_pitch(sig, **kwargs)
    assert ours.shape == ref.shape, kwargs

    # any disagreement must be a numerical tie: the best complete
    # path forced through our lag costs within 1e-4 of the optimum
    same = pitch_oracle.assert_lag_decisions(sig, ours, ref, **kwargs)
    if not same.all():
        assert same.mean() > 0.99, (kwargs, same.mean())


@pytest.mark.parametrize('seed', range(6))
def test_sliding_cmvn_fuzz(seed):
    """Random sliding-CMVN window geometries against the oracle."""
    from shennong_tpu.features import Features
    from shennong_tpu.postprocessor import SlidingWindowCmvnPostProcessor

    rng = np.random.RandomState(300 + seed)
    nframes = int(rng.randint(5, 400))
    data = rng.randn(nframes, int(rng.randint(2, 20))) * 10
    feats = Features(
        data, np.arange(nframes, dtype=float)[:, None] * [1, 1] * 0.01)

    kwargs = dict(
        center=bool(rng.randint(2)),
        cmn_window=int(rng.randint(3, 700)),
        normalize_variance=bool(rng.randint(2)))
    kwargs['min_window'] = int(rng.randint(1, kwargs['cmn_window'] + 1))

    ours = SlidingWindowCmvnPostProcessor(**kwargs).process(feats)
    ref = kaldi_oracle.sliding_window_cmn(
        data.astype(np.float64), **kwargs)
    assert ours.shape == ref.shape, kwargs
    assert np.max(np.abs(ours.data - ref)) < 1e-3, kwargs


@pytest.mark.parametrize('seed', range(4))
def test_process_pitch_fuzz(seed):
    """Random pitch post-processing options against the oracle."""
    import jax.numpy as jnp
    from shennong_tpu.ops.pitch import ProcessPitchOpts, process_pitch

    from tests import pitch_oracle

    rng = np.random.RandomState(400 + seed)
    nframes = int(rng.randint(20, 300))
    raw = np.stack([
        rng.uniform(-1, 1, nframes),           # NCCF
        rng.uniform(60, 350, nframes)], axis=1)  # pitch Hz

    kwargs = dict(
        pitch_scale=float(rng.choice([1.0, 2.0])),
        pov_scale=float(rng.choice([1.0, 2.0])),
        pov_offset=float(rng.choice([0.0, -0.5])),
        delta_pitch_scale=float(rng.choice([5.0, 10.0])),
        normalization_left_context=int(rng.randint(10, 100)),
        normalization_right_context=int(rng.randint(10, 100)),
        delta_window=int(rng.randint(1, 5)),
        delay=int(rng.randint(0, 4)),
        add_pov_feature=True, add_normalized_log_pitch=True,
        add_delta_pitch=True, add_raw_log_pitch=bool(rng.randint(2)))

    opts = ProcessPitchOpts(delta_pitch_noise_stddev=0.0, **kwargs)
    ours = np.asarray(process_pitch(
        jnp.asarray(raw[None].astype(np.float32)),
        jnp.asarray([nframes], np.int32), opts))[0]
    ref = pitch_oracle.process_pitch(
        raw,
        pitch_scale=kwargs['pitch_scale'],
        pov_scale=kwargs['pov_scale'],
        pov_offset=kwargs['pov_offset'],
        delta_pitch_scale=kwargs['delta_pitch_scale'],
        left=kwargs['normalization_left_context'],
        right=kwargs['normalization_right_context'],
        delta_window=kwargs['delta_window'],
        delay=kwargs['delay'],
        add_pov=True, add_norm=True, add_delta=True,
        add_raw=kwargs['add_raw_log_pitch'])
    assert ours.shape == ref.shape, kwargs
    assert np.abs(ours - ref).max() < 1e-3, (
        kwargs, np.abs(ours - ref).max())


@pytest.mark.parametrize('seed', range(8))
def test_framing_fuzz(seed):
    """Random frame geometries: device framing equals a literal
    numpy reimplementation of Kaldi NumFrames/first_sample."""
    import jax.numpy as jnp

    from shennong_tpu.ops.framing import (
        FrameOptions, extract_frames, num_frames)

    rng = np.random.RandomState(500 + seed)
    rate = 16000.0
    shift_ms = float(rng.choice([5.0, 7.0, 10.0, 25.0, 50.0]))
    length_ms = float(rng.choice([10.0, 20.0, 25.0, 31.0, 40.0]))
    snip = bool(rng.randint(2))
    nsamples = int(rng.randint(50, 9000))

    opts = FrameOptions(
        sample_rate=rate, frame_shift_ms=shift_ms,
        frame_length_ms=length_ms, dither=0.0, snip_edges=snip)
    shift, length = opts.window_shift, opts.window_size

    # literal frame count
    if snip:
        expected = 0 if nsamples < length else 1 + (
            nsamples - length) // shift
    else:
        expected = (nsamples + shift // 2) // shift
    nf = num_frames(nsamples, opts)
    assert nf == expected, (shift_ms, length_ms, snip, nsamples)
    if nf == 0:
        return

    signal = rng.randn(nsamples).astype(np.float32) * 100
    padded = np.zeros(max(nsamples, (nf - 1) * shift + length),
                      dtype=np.float32)
    padded[:nsamples] = signal
    frames = np.asarray(extract_frames(
        jnp.asarray(padded[None]),
        jnp.asarray([nsamples], np.int32), opts, nf))[0]

    # literal per-frame extraction with Kaldi edge reflection (the
    # actual while-loop, not a bounded number of rounds: short
    # signals under long windows reflect more than once)
    for t in rng.choice(nf, size=min(nf, 5), replace=False):
        first = (t * shift if snip
                 else t * shift + shift // 2 - length // 2)
        ref = np.empty(length, np.float32)
        for k in range(length):
            i = first + k
            while i < 0 or i >= nsamples:
                i = -i - 1 if i < 0 else 2 * nsamples - 1 - i
            ref[k] = signal[i]
        assert np.array_equal(frames[t], ref), (
            shift_ms, length_ms, snip, nsamples, t)


def test_framing_reflection_beyond_two_rounds():
    """An 80-sample utterance under the default 400-sample window
    (snip_edges=False) needs more than two reflection rounds at the
    frame edges; the closed-form reflection must match Kaldi's
    while-loop exactly for every sample of every frame."""
    import jax.numpy as jnp

    from shennong_tpu.ops.framing import (
        FrameOptions, extract_frames, num_frames)

    nsamples = 80
    opts = FrameOptions(dither=0.0, snip_edges=False)
    shift, length = opts.window_shift, opts.window_size
    nf = num_frames(nsamples, opts)
    assert nf >= 1

    rng = np.random.RandomState(3)
    signal = rng.randn(nsamples).astype(np.float32) * 100
    padded = np.zeros(
        max(nsamples, (nf - 1) * shift + length), np.float32)
    padded[:nsamples] = signal
    frames = np.asarray(extract_frames(
        jnp.asarray(padded[None]),
        jnp.asarray([nsamples], np.int32), opts, nf))[0]

    for t in range(nf):
        first = t * shift + shift // 2 - length // 2
        ref = np.empty(length, np.float32)
        for k in range(length):
            i = first + k
            while i < 0 or i >= nsamples:
                i = -i - 1 if i < 0 else 2 * nsamples - 1 - i
            ref[k] = signal[i]
        np.testing.assert_array_equal(frames[t], ref, err_msg=str(t))
