"""The MXU matmul-DFT paths match the FFT paths.

These TPU-only fast paths (selected by backend at trace time) are
checked on CPU by calling the matmul implementations directly.
"""

import numpy as np

import jax.numpy as jnp

from shennong_tpu.ops.pitch import (
    PitchOpts, _nccf_correlations, _nccf_inner_matmul)
from shennong_tpu.ops.spectral import power_spectrum, power_spectrum_matmul


def test_power_spectrum_matmul_matches_fft():
    rng = np.random.RandomState(0)
    for width, padded in [(400, 512), (512, 512), (200, 256), (7, 8)]:
        frames = jnp.asarray(rng.randn(3, 5, width).astype(np.float32))
        via_fft = np.asarray(power_spectrum(frames, padded))
        via_mm = np.asarray(power_spectrum_matmul(frames, padded))
        assert via_mm.shape == via_fft.shape == (3, 5, padded // 2 + 1)
        scale = max(via_fft.max(), 1.0)
        assert np.abs(via_mm - via_fft).max() / scale < 1e-5, (width, padded)


def test_nccf_inner_matmul_matches_fft():
    rng = np.random.RandomState(1)
    opts = PitchOpts()
    window_size = opts.window_size_samples
    first_lag, last_lag = opts.first_lag, opts.last_lag
    width = window_size + last_lag
    windows = jnp.asarray(rng.randn(4, 9, width).astype(np.float32))

    inner_fft, e1, e2 = _nccf_correlations(
        windows, window_size, first_lag, last_lag)
    inner_mm = _nccf_inner_matmul(
        windows, window_size, first_lag, last_lag)

    assert inner_mm.shape == inner_fft.shape
    scale = float(np.abs(np.asarray(inner_fft)).max())
    assert np.abs(np.asarray(inner_mm - inner_fft)).max() / scale < 1e-5

    # direct O(n^2) reference for a few entries
    w = np.asarray(windows, dtype=np.float64)
    for (b, f, k) in [(0, 0, 0), (2, 5, 30), (3, 8, last_lag - first_lag)]:
        lag = first_lag + k
        ref = np.dot(w[b, f, :window_size], w[b, f, lag:lag + window_size])
        assert np.asarray(inner_mm)[b, f, k] == np.float32(
            np.asarray(inner_mm)[b, f, k])
        assert abs(np.asarray(inner_mm)[b, f, k] - ref) / max(
            abs(ref), 1.0) < 1e-4


def test_resample_conv_path_matches_slices(monkeypatch):
    """The TPU conv fast path of the resampler matches the
    strided-slice path (checked on CPU by forcing the branch)."""
    import shennong_tpu.ops.resample as R

    rng = np.random.RandomState(2)
    signals = jnp.asarray(rng.randn(3, 8000).astype(np.float32))
    by_slices = np.asarray(
        R.linear_resample(signals, 8000, 16000.0, 4000.0, 1000.0, 1))
    monkeypatch.setattr(R.jax, 'default_backend', lambda: 'tpu')
    by_conv = np.asarray(
        R.linear_resample(signals, 8000, 16000.0, 4000.0, 1000.0, 1))
    assert by_conv.shape == by_slices.shape
    scale = np.abs(by_slices).max()
    assert np.abs(by_conv - by_slices).max() / scale < 1e-6


def test_folded_front_end_matches_sequential(monkeypatch):
    """The folded (one-matmul) TPU front end equals the sequential
    dither->DC->preemph->window->DFT chain, forced on CPU, for
    every option combination it covers."""
    import itertools

    import shennong_tpu.ops.spectral as SP
    from shennong_tpu.ops.framing import FrameOptions, num_frames

    rng = np.random.RandomState(3)
    signals = jnp.asarray(rng.randn(3, 4000).astype(np.float32) * 5000)
    nsamples = jnp.asarray([4000, 3500, 2111], dtype=np.int32)

    for preemph, dc, wtype in itertools.product(
            (0.97, 0.0), (True, False), ('povey', 'rectangular')):
        frame = FrameOptions(
            dither=0.0, preemph_coeff=preemph, remove_dc_offset=dc,
            window_type=wtype)
        opts = SP.SpectrogramOpts(frame=frame, raw_energy=True)
        fmax = num_frames(4000, frame)

        seq_power, seq_energy = SP._power_and_energy(
            signals, nsamples, opts, fmax, None)
        monkeypatch.setattr(SP.jax, 'default_backend', lambda: 'tpu')
        fold_power, fold_energy = SP._power_and_energy(
            signals, nsamples, opts, fmax, None)
        monkeypatch.undo()

        scale = float(np.asarray(seq_power).max())
        assert np.abs(
            np.asarray(fold_power - seq_power)).max() / scale < 1e-5, (
                preemph, dc, wtype)
        assert np.abs(
            np.asarray(fold_energy - seq_energy)).max() < 1e-3, (
                preemph, dc, wtype)


def test_folded_energy_stable_under_dc_offset(monkeypatch):
    """Raw energy from the folded path must not catastrophically
    cancel on DC-biased frames: a constant bias of 1e4 (a cheap-mic
    offset, well inside int16 range) makes sum(x^2) and
    (sum x)^2 / N both ~1e10, whose float32 difference is pure
    noise — the energy must be summed over centered values."""
    import shennong_tpu.ops.spectral as SP
    from shennong_tpu.ops.framing import FrameOptions, num_frames

    rng = np.random.RandomState(7)
    # near-silence on a large DC pedestal
    signals = jnp.asarray(
        (rng.randn(2, 4000) * 3.0 + 10000.0).astype(np.float32))
    nsamples = jnp.asarray([4000, 3000], dtype=np.int32)
    frame = FrameOptions(dither=0.0, remove_dc_offset=True)
    opts = SP.SpectrogramOpts(frame=frame, raw_energy=True)
    fmax = num_frames(4000, frame)

    seq_power, seq_energy = SP._power_and_energy(
        signals, nsamples, opts, fmax, None)
    monkeypatch.setattr(SP.jax, 'default_backend', lambda: 'tpu')
    fold_power, fold_energy = SP._power_and_energy(
        signals, nsamples, opts, fmax, None)
    monkeypatch.undo()

    # the frames hold real signal power (~ N * var ~ 3600), so a
    # cancellation to FLT_EPSILON would show as log(eps) ~ -15.9
    assert float(np.asarray(seq_energy).min()) > 5.0
    assert np.abs(
        np.asarray(fold_energy - seq_energy)).max() < 1e-3
