"""Kaldi pitch tracker (Ghahremani & Povey 2014), batched on TPU.

Replaces ``kaldi.feat.pitch.compute_kaldi_pitch`` and
``process_pitch`` (reference call sites
``shennong/processor/pitch_kaldi.py:298`` and ``:536``) with a fully
batched XLA program:

- bandlimited downsampling to the analysis rate (gather + dot),
- NCCF over integer lags via FFT cross-correlation (no [F, lag, win]
  materialization),
- lag upsampling onto the geometric lag grid as one matmul,
- the frame-recursive Viterbi lag selection as a ``lax.scan`` with a
  vectorized min-plus step and backtracking,
- pitch post-processing (POV mapping, POV-weighted moving-window mean
  subtraction, noised delta) as windowed prefix-sum ops.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from shennong_tpu.ops import resample


@dataclasses.dataclass(frozen=True)
class PitchOpts:
    """Static options of the pitch extractor (Kaldi
    PitchExtractionOptions)."""
    sample_rate: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 50.0
    max_f0: float = 400.0
    soft_min_f0: float = 10.0
    penalty_factor: float = 0.1
    lowpass_cutoff: float = 1000.0
    resample_freq: float = 4000.0
    delta_pitch: float = 0.005
    nccf_ballast: float = 7000.0
    lowpass_filter_width: int = 1
    upsample_filter_width: int = 5
    snip_edges: bool = True

    @property
    def frame_shift_samples(self):
        """Frame shift at the analysis rate"""
        return int(self.resample_freq * 0.001 * self.frame_shift_ms)

    @property
    def window_size_samples(self):
        """NCCF window size at the analysis rate"""
        return int(self.resample_freq * 0.001 * self.frame_length_ms)

    @property
    def first_lag(self):
        return int(math.ceil(self.resample_freq / self.max_f0))

    @property
    def last_lag(self):
        return int(math.floor(self.resample_freq / self.min_f0))


@dataclasses.dataclass(frozen=True)
class ProcessPitchOpts:
    """Static options of the pitch post-processor (Kaldi
    ProcessPitchOptions)."""
    pitch_scale: float = 2.0
    pov_scale: float = 2.0
    pov_offset: float = 0.0
    delta_pitch_scale: float = 10.0
    delta_pitch_noise_stddev: float = 0.005
    normalization_left_context: int = 75
    normalization_right_context: int = 75
    delta_window: int = 2
    delay: int = 0
    add_pov_feature: bool = True
    add_normalized_log_pitch: bool = True
    add_delta_pitch: bool = True
    add_raw_log_pitch: bool = False


@functools.lru_cache(maxsize=None)
def select_lags(min_f0, max_f0, delta_pitch):
    """The geometric grid of candidate lags, in seconds."""
    lags = []
    lag = 1.0 / max_f0
    while lag <= 1.0 / min_f0:
        lags.append(lag)
        lag *= 1.0 + delta_pitch
    return np.asarray(lags, dtype=np.float64)


def num_pitch_frames(nsamples, opts):
    """Frames produced for ``nsamples`` input samples (input finished).

    Kaldi NumFramesAvailable with input_finished: the basic window
    size (without the max lag) bounds the last frame; tail windows are
    zero padded.
    """
    num_rs = resample.linear_resample_num_samples(
        nsamples, opts.sample_rate, opts.resample_freq)
    shift = opts.frame_shift_samples
    length = opts.window_size_samples
    if num_rs < length:
        return 0
    if not opts.snip_edges:
        return int(num_rs / shift + 0.5)
    return (num_rs - length) // shift + 1


@functools.lru_cache(maxsize=None)
def _energy_band(width, window_size, first_lag, last_lag):
    """0/1 matrix [width, 1 + nlags] summing the first window
    (column 0) and each lag-shifted window (columns 1+)."""
    nlags = last_lag + 1 - first_lag
    band = np.zeros((width, 1 + nlags), dtype=np.float32)
    band[:window_size, 0] = 1.0
    for k, lag in enumerate(range(first_lag, last_lag + 1)):
        band[lag:lag + window_size, 1 + k] = 1.0
    return band


@functools.lru_cache(maxsize=None)
def _nccf_dft_bases(width, window_size, first_lag, last_lag):
    """Constant matrices turning the NCCF cross-correlation into
    three small matmuls (forward DFT of the full and truncated
    windows, and an inverse DFT evaluated only at the needed lags).

    The matmul DFT needs no power-of-two size: any ``fft_size >=
    width`` gives the exact linear correlation (the first sequence is
    zero beyond ``window_size``, the second beyond ``width``, and
    every needed circular index ``i + lag`` stays below ``width``).
    The size is chosen so the bin count lands on a 128-lane boundary
    — for the default geometry 766 points / 384 bins instead of 1024
    / 513 (which padded to 640 lanes), a ~40% MXU-work cut."""
    nbins = -(-(width // 2 + 1) // 128) * 128
    while 2 * (nbins - 1) < width:
        nbins += 128
    fft_size = 2 * (nbins - 1)
    k = np.arange(nbins)

    def fwd(n):
        ang = 2.0 * np.pi * np.outer(np.arange(n), k) / fft_size
        return (np.cos(ang).astype(np.float32),
                (-np.sin(ang)).astype(np.float32))

    cos_w, sin_w = fwd(width)
    cos_1, sin_1 = fwd(window_size)

    # real inverse DFT at the lag rows only; DC and Nyquist bins enter
    # once, every other bin twice (conjugate symmetry)
    lag_idx = np.arange(first_lag, last_lag + 1)
    weight = np.full(nbins, 2.0 / fft_size)
    weight[0] = 1.0 / fft_size
    if fft_size % 2 == 0:
        weight[-1] = 1.0 / fft_size
    ang = 2.0 * np.pi * np.outer(k, lag_idx) / fft_size
    inv_cos = (np.cos(ang) * weight[:, None]).astype(np.float32)
    inv_sin = (-np.sin(ang) * weight[:, None]).astype(np.float32)
    return cos_w, sin_w, cos_1, sin_1, inv_cos, inv_sin


def _nccf_inner_matmul(windows, window_size, first_lag, last_lag):
    """Correlation inner products as MXU matmuls (TPU path)."""
    mats = _nccf_dft_bases(
        windows.shape[-1], window_size, first_lag, last_lag)
    cos_w, sin_w, cos_1, sin_1, inv_cos, inv_sin = (
        jnp.asarray(m) for m in mats)
    hi = jax.lax.Precision.HIGHEST

    def mm(mat_a, mat_b):
        return jnp.einsum(
            '...w,wk->...k', mat_a, mat_b, precision=hi,
            preferred_element_type=jnp.float32)

    w1 = windows[..., :window_size]
    w_re, w_im = mm(windows, cos_w), mm(windows, sin_w)
    u_re, u_im = mm(w1, cos_1), mm(w1, sin_1)
    # spec_w * conj(spec_w1), then the inverse transform at the lags
    prod_re = w_re * u_re + w_im * u_im
    prod_im = w_im * u_re - w_re * u_im
    return mm(prod_re, inv_cos) + mm(prod_im, inv_sin)


def _nccf_correlations(windows, window_size, first_lag, last_lag):
    """inner products and energies for the NCCF.

    ``windows`` is [B, F, W] (W = window_size + last_lag) with the
    mean of the first ``window_size`` samples already removed.
    Returns (inner [B, F, nlags], e1 [B, F], e2 [B, F, nlags]).
    """
    # sliding energies as one small 0/1-band matmul (col 0 = the
    # first window, col 1+k = the window at lag first_lag+k); the
    # square fuses into the matmul read, and unlike the prefix-sum
    # formulation nothing cancels catastrophically
    lag_idx = np.arange(first_lag, last_lag + 1)
    energies = jnp.einsum(
        'bfw,wk->bfk', windows * windows,
        jnp.asarray(_energy_band(
            windows.shape[-1], window_size, first_lag, last_lag)),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    e1 = energies[..., 0]
    e2 = energies[..., 1:]

    # cross-correlation: inner[lag] = sum_i w1[i] * w[i + lag]; on TPU
    # the three DFTs run as matmuls on the MXU, elsewhere as FFTs
    if jax.default_backend() == 'tpu':
        inner = _nccf_inner_matmul(
            windows, window_size, first_lag, last_lag)
    else:
        fft_size = 1 << (windows.shape[-1] - 1).bit_length()
        w1 = jnp.where(
            jnp.arange(windows.shape[-1]) < window_size, windows, 0.0)
        spec_w = jnp.fft.rfft(windows, n=fft_size, axis=-1)
        spec_w1 = jnp.fft.rfft(w1, n=fft_size, axis=-1)
        corr = jnp.fft.irfft(
            spec_w * jnp.conj(spec_w1), n=fft_size, axis=-1)
        inner = jnp.take(corr, lag_idx, axis=-1)

    return inner, e1, e2


def _viterbi_lags(local_cost, inter_frame_factor, nframes):
    """Frame-recursive lag selection with backtracking.

    ``local_cost`` is [B, F, L]; transition cost between lag states i
    (previous) and j (current) is (i - j)^2 * inter_frame_factor.
    Returns the best lag index per frame [B, F] (int32), computed from
    a forward min-plus scan and a backward backtrace, both masked so
    padded frames are pass-through.
    """
    bsz, maxframes, nlags = local_cost.shape
    idx = jnp.arange(nlags)
    penalty = (
        (idx[:, None] - idx[None, :]).astype(jnp.float32) ** 2
        * inter_frame_factor)  # symmetric [L, L]

    frame_ids = jnp.arange(maxframes)
    valid = (frame_ids[None, :] < nframes[:, None])  # [B, F]

    # Forward pass: min-plus only (no argmin) — backpointers are
    # recovered on the backward pass in O(L) per frame by re-solving
    # the argmin along the chosen path, halving the O(L^2) work.
    def forward_step(carry, inputs):
        fwd = carry  # [B, L]
        cost_t, valid_t = inputs  # [B, L], [B]
        # reduce over the previous-lag axis placed minor for the VPU
        total = fwd[:, None, :] + penalty[None, :, :]  # [B, Lc, Lp]
        new_fwd = cost_t + jnp.min(total, axis=2)
        # re-center to avoid drift, mask padded frames as pass-through
        new_fwd = new_fwd - jnp.min(new_fwd, axis=1, keepdims=True)
        new_fwd = jnp.where(valid_t[:, None], new_fwd, fwd)
        # emit the pre-update forward costs for the backward pass
        return new_fwd, fwd

    init = local_cost[:, 0, :]
    init = init - jnp.min(init, axis=1, keepdims=True)
    xs = (local_cost[:, 1:].transpose(1, 0, 2), valid[:, 1:].T)
    final_fwd, fwd_hist = jax.lax.scan(
        forward_step, init, xs, unroll=4)
    # fwd_hist[t] = forward costs after frame t (before frame t+1)

    # start the backtrace at the last *valid* frame of each utterance
    last_best = jnp.argmin(final_fwd, axis=1).astype(jnp.int32)  # [B]

    lag_ids = jnp.arange(nlags, dtype=jnp.float32)

    def backward_step(carry, inputs):
        best_next = carry  # [B]
        fwd_t, valid_next = inputs  # [B, L], [B]
        # argmin_i fwd_t[i] + penalty(i, best_next); the quadratic
        # penalty evaluates directly, no gather
        diff = best_next.astype(jnp.float32)[:, None] - lag_ids[None, :]
        scores = fwd_t + diff * diff * inter_frame_factor
        best_here = jnp.argmin(scores, axis=1).astype(jnp.int32)
        # if frame t+1 is padding, the state passes through unchanged
        best_here = jnp.where(valid_next, best_here, best_next)
        return best_here, best_here

    _, best_rev = jax.lax.scan(
        backward_step, last_best,
        (fwd_hist[::-1], valid[:, 1:].T[::-1]), unroll=4)
    # best_rev holds frames F-2 .. 0 (reversed); append the last frame
    best = jnp.concatenate(
        [best_rev[::-1].T, last_best[:, None]], axis=1)  # [B, F]
    return best


@functools.partial(jax.jit, static_argnames=('opts', 'nframes_max'))
def compute_pitch(signals, nsamples, opts, nframes_max):
    """Batched Kaldi pitch: [B, T] signals -> [B, F, 2] (NCCF, pitch).

    ``signals`` are int16-range float32 padded to a common length,
    ``nsamples`` the true per-utterance sample counts.
    """
    # 1. downsample to the analysis rate
    resampled = resample.linear_resample(
        signals, signals.shape[1], opts.sample_rate, opts.resample_freq,
        opts.lowpass_cutoff, opts.lowpass_filter_width)
    num_rs_max = resampled.shape[1]

    # per-utterance resampled lengths: Kaldi's tick arithmetic
    # reduces to last = floor(n * out_rate / in_rate), decremented
    # when the product divides exactly, plus one. Computed through
    # the division decomposition n = q*in_r + r so no intermediate
    # exceeds int32 even for hour-scale non-16k-rate signals
    # (n * out_r would wrap past ~54M samples at 44.1 kHz)
    gcd = math.gcd(int(opts.sample_rate), int(opts.resample_freq))
    out_r = int(opts.resample_freq) // gcd
    in_r = int(opts.sample_rate) // gcd
    n32 = nsamples.astype(jnp.int32)
    quot, rem = n32 // in_r, n32 % in_r
    last = quot * out_r + rem * out_r // in_r
    exact = (rem * out_r) % in_r == 0
    num_rs = (last - exact.astype(jnp.int32) + 1).astype(jnp.int32)

    # zero out the padding of the resampled signal
    t = jnp.arange(num_rs_max)[None, :]
    resampled = jnp.where(t < num_rs[:, None], resampled, 0.0)

    # mean square over the real samples (for the NCCF ballast)
    denom = jnp.maximum(num_rs.astype(jnp.float32), 1.0)
    mean = jnp.sum(resampled, axis=1) / denom
    mean_square = jnp.sum(resampled * resampled, axis=1) / denom - \
        mean * mean

    nframes = pitch_num_frames_device(num_rs, opts)
    return pitch_from_resampled(
        resampled, nframes, mean_square, opts, nframes_max)


def pitch_from_resampled(resampled, nframes, mean_square, opts,
                         nframes_max):
    """NCCF + Viterbi lag selection on an already-resampled signal.

    ``resampled`` is [B, R] at ``opts.resample_freq`` with zeros
    beyond each row's valid samples, ``nframes`` the per-row valid
    frame counts (frames past it are Viterbi pass-through) and
    ``mean_square`` the per-row ballast statistic (over the *whole*
    utterance, so chunked extraction passes the global value).
    Returns [B, nframes_max, 2].
    """
    shift = opts.frame_shift_samples
    window_size = opts.window_size_samples
    first_lag, last_lag = opts.first_lag, opts.last_lag
    full_window = window_size + last_lag

    # 2. extract outer windows: frame starts are multiples of the
    # shift, so windows assemble from strided chunk slices (the
    # resampled buffer is zero beyond each utterance's valid samples,
    # giving Kaldi's zero padding of tail windows for free)
    needed = (nframes_max + full_window // shift + 1) * shift
    padded_rs = resampled
    if padded_rs.shape[1] < needed:
        padded_rs = jnp.pad(
            padded_rs, ((0, 0), (0, needed - padded_rs.shape[1])))
    elif padded_rs.shape[1] % shift:
        padded_rs = jnp.pad(
            padded_rs,
            ((0, 0), (0, shift - padded_rs.shape[1] % shift)))
    chunks = padded_rs.reshape(padded_rs.shape[0], -1, shift)
    pieces = [
        chunks[:, j:j + nframes_max]
        for j in range(full_window // shift)]
    if full_window % shift:
        pieces.append(
            chunks[:, full_window // shift:
                   full_window // shift + nframes_max,
                   :full_window % shift])
    windows = jnp.concatenate(pieces, axis=-1)

    # subtract the mean of the first window_size samples (Kaldi
    # ComputeCorrelation's zero_mean_wave)
    mean1 = jnp.mean(windows[..., :window_size], axis=-1, keepdims=True)
    windows = windows - mean1

    # 3. NCCF at integer lags
    inner, e1, e2 = _nccf_correlations(
        windows, window_size, first_lag, last_lag)
    norm = e1[..., None] * e2
    ballast = (
        (mean_square * window_size) ** 2 * opts.nccf_ballast
    )[:, None, None]
    nccf_pitch = jnp.where(
        norm + ballast > 0.0,
        inner / jnp.sqrt(jnp.maximum(norm + ballast, 1e-30)), 0.0)
    nccf_pov = jnp.where(
        norm > 0.0, inner / jnp.sqrt(jnp.maximum(norm, 1e-30)), 0.0)

    # 4. upsample the NCCF onto the geometric lag grid
    lags = select_lags(opts.min_f0, opts.max_f0, opts.delta_pitch)
    lags_offset = tuple(
        float(l - first_lag / opts.resample_freq) for l in lags)
    upsample = jnp.asarray(resample.arbitrary_resample_matrix(
        last_lag + 1 - first_lag, opts.resample_freq, lags_offset,
        opts.resample_freq * 0.5, opts.upsample_filter_width))
    nccf_pitch_rs = jnp.einsum(
        'bfl,gl->bfg', nccf_pitch, upsample,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    # 5. Viterbi lag selection
    lags_f32 = jnp.asarray(lags, dtype=jnp.float32)
    local_cost = (
        1.0 - nccf_pitch_rs
        + opts.soft_min_f0 * lags_f32[None, None, :] * nccf_pitch_rs)
    inter_frame_factor = (
        opts.penalty_factor * math.log(1.0 + opts.delta_pitch) ** 2)
    if jax.default_backend() == 'tpu':
        # single-kernel forward recursion with the state in VMEM
        from shennong_tpu.ops.pallas_viterbi import viterbi_lags_pallas
        best = viterbi_lags_pallas(
            local_cost, inter_frame_factor, nframes)
    else:
        best = _viterbi_lags(local_cost, inter_frame_factor, nframes)

    # 6. assemble (NCCF, pitch) output; the POV-ballast NCCF is only
    # needed at the selected lag, so its lag upsampling evaluates the
    # single chosen matrix row per frame instead of the full grid
    pitch = 1.0 / jnp.take(lags_f32, best)
    rows = jnp.take(upsample, best, axis=0)  # [B, F, nlags_int]
    nccf_out = jnp.einsum(
        'bfl,bfl->bf', nccf_pov, rows,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return jnp.stack([nccf_out, pitch], axis=-1)


def pitch_num_frames_device(num_rs, opts):
    """Per-utterance frame counts, traced (mirrors
    :func:`num_pitch_frames`)."""
    shift = opts.frame_shift_samples
    length = opts.window_size_samples
    if not opts.snip_edges:
        nframes = (num_rs.astype(jnp.float32) / shift + 0.5).astype(
            jnp.int32)
    else:
        nframes = (num_rs - length) // shift + 1
    return jnp.maximum(jnp.where(num_rs < length, 0, nframes), 0)


_pitch_from_resampled_jit = jax.jit(
    pitch_from_resampled, static_argnames=('opts', 'nframes_max'))


def compute_pitch_long(signal, opts, chunk_frames=8000,
                       halo_frames=200, chunk_batch=8):
    """Kaldi pitch for hour-scale signals in bounded-memory chunks.

    Three deviations from one whole-utterance program, all bounded:
    the signal is resampled in aligned chunks whose halos cover the
    full sinc support (interior values are bit-identical to the
    whole-signal resample), the NCCF ballast uses the global
    mean-square accumulated in float64 on the host (the device
    program accumulates the same sum in float32), and the Viterbi lag
    selection runs per chunk of ``chunk_frames`` frames with
    ``halo_frames`` context frames on each side — paths coalesce well
    inside a 200-frame (2 s) halo, so kept decisions match the
    whole-utterance program (see tests/processor/test_pitch_kaldi.py).
    Chunks share one compiled program, dispatched ``chunk_batch`` at
    a time. Returns a [total_frames, 2] float32 numpy array.
    """
    signal = np.asarray(signal, dtype=np.float32)
    nsamp = signal.shape[0]
    ftotal = num_pitch_frames(nsamp, opts)
    if ftotal == 0:
        return np.zeros((0, 2), dtype=np.float32)

    resampled = resample.linear_resample_chunked(
        signal, opts.sample_rate, opts.resample_freq,
        opts.lowpass_cutoff, opts.lowpass_filter_width)
    nrs = resampled.shape[0]
    mean = resampled.sum(dtype=np.float64) / nrs
    mean_square = float(
        np.einsum('i,i->', resampled, resampled, dtype=np.float64)
        / nrs - mean * mean)

    cf, halo = int(chunk_frames), int(halo_frames)
    shift = opts.frame_shift_samples
    full_window = opts.window_size_samples + opts.last_lag
    fslice = cf + 2 * halo
    rslice = fslice * shift + full_window

    nchunks = -(-ftotal // cf)
    starts = [max(0, c * cf - halo) for c in range(nchunks)]
    maxend = starts[-1] * shift + rslice
    buf = np.zeros(maxend, np.float32)
    valid = min(nrs, maxend)
    buf[:valid] = resampled[:valid]

    ms_arr = jnp.full((chunk_batch,), mean_square, jnp.float32)
    out = np.empty((ftotal, 2), np.float32)
    for group0 in range(0, nchunks, chunk_batch):
        group = range(group0, min(group0 + chunk_batch, nchunks))
        arr = np.zeros((chunk_batch, rslice), np.float32)
        nframes = np.zeros((chunk_batch,), np.int32)
        for i, c in enumerate(group):
            lo = starts[c] * shift
            arr[i] = buf[lo:lo + rslice]
            nframes[i] = min(fslice, ftotal - starts[c])
        feats = np.asarray(_pitch_from_resampled_jit(
            jnp.asarray(arr), jnp.asarray(nframes), ms_arr, opts,
            fslice))
        for i, c in enumerate(group):
            keep0 = c * cf
            keep1 = min(keep0 + cf, ftotal)
            local = keep0 - starts[c]
            out[keep0:keep1] = feats[i, local:local + keep1 - keep0]
    return out


# ---------------------------------------------------------------- post

def _nccf_to_pov(nccf):
    """Probability of voicing from NCCF (Kaldi NccfToPov)."""
    ndash = jnp.minimum(jnp.abs(nccf), 1.0)
    r = (-5.2 + 5.4 * jnp.exp(7.5 * (ndash - 1.0)) + 4.8 * ndash
         - 2.0 * jnp.exp(-10.0 * ndash)
         + 4.2 * jnp.exp(20.0 * (ndash - 1.0)))
    return 1.0 / (1.0 + jnp.exp(-r))


def _nccf_to_pov_feature(nccf):
    """Warped NCCF feature (Kaldi NccfToPovFeature)."""
    n = jnp.clip(nccf, -1.0, 1.0)
    return jnp.power(1.0001 - n, 0.15) - 1.0


@functools.partial(jax.jit, static_argnames=('opts',))
def process_pitch(raw_pitch, nframes, opts, noise=None):
    """Turn raw (NCCF, pitch) into trainable features.

    ``raw_pitch`` is [B, F, 2]; returns [B, F, ndims] with columns
    (pov_feature, normalized_log_pitch, delta_pitch, raw_log_pitch)
    filtered by the ``add_*`` flags. ``noise`` optionally supplies the
    per-frame gaussian noise added to the delta (stddev 1, scaled by
    ``delta_pitch_noise_stddev``).
    """
    bsz, maxframes, _ = raw_pitch.shape
    nccf = raw_pitch[..., 0]
    pitch = raw_pitch[..., 1]

    t = jnp.arange(maxframes, dtype=jnp.int32)[None, :]
    n = nframes[:, None].astype(jnp.int32)
    valid = t < n

    # apply the frame delay (clamped to the valid frame range so a
    # negative delay repeats the last real frame instead of reading
    # padded garbage past it)
    if opts.delay != 0:
        delayed = jnp.clip(t - opts.delay, 0, jnp.maximum(n - 1, 0))
        nccf = jnp.take_along_axis(nccf, delayed, axis=1)
        pitch = jnp.take_along_axis(pitch, delayed, axis=1)

    log_pitch = jnp.log(jnp.maximum(pitch, 1e-10))
    columns = []

    if opts.add_pov_feature:
        columns.append(
            opts.pov_scale * _nccf_to_pov_feature(nccf)
            + opts.pov_offset)

    if opts.add_normalized_log_pitch:
        pov = jnp.where(valid, _nccf_to_pov(nccf), 0.0)
        weighted = pov * jnp.where(valid, log_pitch, 0.0)
        zeros = jnp.zeros((bsz, 1), dtype=pov.dtype)
        cpov = jnp.concatenate([zeros, jnp.cumsum(pov, axis=1)], axis=1)
        cwlp = jnp.concatenate(
            [zeros, jnp.cumsum(weighted, axis=1)], axis=1)
        begin = jnp.maximum(t - opts.normalization_left_context, 0)
        end = jnp.minimum(t + opts.normalization_right_context + 1, n)
        sum_pov = (jnp.take_along_axis(cpov, end, axis=1)
                   - jnp.take_along_axis(cpov, begin, axis=1))
        sum_wlp = (jnp.take_along_axis(cwlp, end, axis=1)
                   - jnp.take_along_axis(cwlp, begin, axis=1))
        avg = sum_wlp / jnp.maximum(sum_pov, 1e-20)
        columns.append((log_pitch - avg) * opts.pitch_scale)

    if opts.add_delta_pitch:
        from shennong_tpu.ops.postops import compute_deltas
        delta = compute_deltas(
            log_pitch[..., None], nframes, order=1,
            window=opts.delta_window)[..., 1]
        if noise is not None:
            delta = delta + noise * opts.delta_pitch_noise_stddev
        columns.append(delta * opts.delta_pitch_scale)

    if opts.add_raw_log_pitch:
        columns.append(log_pitch)

    return jnp.stack(columns, axis=-1)
