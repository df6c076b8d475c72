"""Batched post-processing ops: deltas, CMVN, sliding CMVN, VAD.

Replaces ``kaldi.feat.functions.compute_deltas`` /
``sliding_window_cmn`` (reference call sites
``shennong/postprocessor/delta.py:130`` and
``shennong/postprocessor/cmvn.py:492``), ``kaldi.transform.cmvn.Cmvn``
(``shennong/postprocessor/cmvn.py:278``) and
``kaldi.ivector.compute_vad_energy``
(``shennong/postprocessor/vad.py:183``) with masked, batched XLA
computations: deltas become shifted-weighted sums (fully fused
elementwise), sliding CMVN becomes prefix-sum window statistics, CMVN
an affine transform, and VAD a windowed comparison vote.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from shennong_tpu.ops.framing import bucket_size


def batch_ragged(arrays, minimum=128, batch_rows=16):
    """Group ragged [T_i, D] matrices into padded masked batches.

    Yields (indices, stacked [B, bucket, D] float32, nframes [B]
    int32) with indices into ``arrays``; grouping is by (frame bucket,
    dim) and batches use a fixed width so the jit cache stays keyed by
    O(log T) shapes. Padding rows carry one zero frame.
    """
    groups = {}
    for index, data in enumerate(arrays):
        key = (bucket_size(data.shape[0], minimum=minimum),
               data.shape[1])
        groups.setdefault(key, []).append(index)

    for (bucket, dim), indices in sorted(groups.items()):
        for start in range(0, len(indices), batch_rows):
            chunk = indices[start:start + batch_rows]
            rows = (batch_rows if len(indices) > batch_rows
                    else len(chunk))
            stacked = np.zeros((rows, bucket, dim), dtype=np.float32)
            nframes = np.ones(rows, dtype=np.int32)
            for row, index in enumerate(chunk):
                data = arrays[index]
                stacked[row, :data.shape[0]] = data
                nframes[row] = data.shape[0]
            yield chunk, stacked, nframes


def pad_frame_axis(data, minimum=128):
    """Pad a [nframes, dim] matrix to a frame-count bucket.

    Single-utterance post-processing calls jit once per distinct
    (bucket, dim) pair instead of once per utterance length. Returns
    (padded [1, bucket, dim] float32, nframes [1] int32).
    """
    nframes = data.shape[0]
    bucket = bucket_size(nframes, minimum=minimum)
    padded = np.zeros((1, bucket, data.shape[1]), dtype=np.float32)
    padded[0, :nframes] = data
    return padded, np.array([nframes], dtype=np.int32)


# ------------------------------------------------------------------- deltas

@functools.lru_cache(maxsize=None)
def delta_scales(order, window):
    """Kaldi's polynomial-fit delta coefficients for every order.

    Returns a tuple of numpy vectors; scales[k] has length
    2*k*window + 1 and computes the k-th order derivative by
    correlation with the (edge-replicated) feature sequence.
    """
    scales = [np.array([1.0])]
    for i in range(1, order + 1):
        prev = scales[i - 1]
        prev_offset = (len(prev) - 1) // 2
        cur_offset = prev_offset + window
        cur = np.zeros(len(prev) + 2 * window)
        normalizer = 0.0
        for j in range(-window, window + 1):
            normalizer += j * j
            for k in range(-prev_offset, prev_offset + 1):
                cur[j + k + cur_offset] += j * prev[k + prev_offset]
        scales.append(cur / normalizer)
    return tuple(s.astype(np.float32) for s in scales)


@functools.partial(jax.jit, static_argnames=('order', 'window'))
def compute_deltas(feats, nframes, order=2, window=2):
    """Append time derivatives: [B, T, D] -> [B, T, (order+1)*D].

    Edge behavior replicates the first/last *valid* frame per
    utterance (``nframes`` gives the true frame counts; frames beyond
    are padding and do not leak into valid outputs).
    """
    bsz, maxframes, dim = feats.shape
    max_offset = order * window

    # replicate the last valid frame into the padding so the clamped
    # window reads of valid frames match Kaldi's edge handling
    idx = jnp.arange(maxframes)[None, :]
    last = (nframes[:, None] - 1).astype(jnp.int32)
    clamped = jnp.minimum(idx, last)
    feats = jnp.take_along_axis(feats, clamped[:, :, None], axis=1)

    padded = jnp.pad(
        feats, ((0, 0), (max_offset, max_offset), (0, 0)), mode='edge')

    outputs = []
    for k, scale in enumerate(delta_scales(order, window)):
        offset = k * window
        acc = jnp.zeros_like(feats)
        for j, coeff in enumerate(scale):
            shift = j - offset  # in [-offset, offset]
            acc = acc + float(coeff) * jax.lax.dynamic_slice_in_dim(
                padded, max_offset + shift, maxframes, axis=1)
        outputs.append(acc)
    return jnp.concatenate(outputs, axis=-1)


def compute_deltas_host(arrays, order=2, window=2):
    """Time derivatives of many [T_i, D] matrices on the HOST.

    Numerically the vectorized-numpy twin of :func:`compute_deltas`
    (same Kaldi filters, same edge replication), computed in float32
    like both the device kernel and Kaldi's BaseFloat. Through a thin
    host-device link the delta filter is bandwidth-bound, not
    compute-bound: shipping a [T, D] matrix to the device and
    fetching a [T, 3D] result back costs far more than the ~9
    multiply-adds per output value, so the pipeline's pass 2 applies
    deltas here, batched per frame-count group. The device kernel
    remains the right choice inside fused programs where the features
    never leave the device (``parallel/fused.py``).

    Returns the list of [T_i, (order+1)*D] float32 outputs in order.
    """
    scales = delta_scales(order, window)
    max_offset = order * window
    outputs = [None] * len(arrays)

    groups = {}
    for index, data in enumerate(arrays):
        groups.setdefault(np.asarray(data).shape, []).append(index)

    # bound host memory: a uniform-length corpus puts every
    # utterance in one shape group, so process at most ~32 MB of
    # padded rows per step instead of the whole group. This host
    # touches fresh pages at ~0.1-0.2 GB/s, so the two scratch
    # buffers are written in place and reused across filter taps
    # instead of allocating a temporary per tap.
    for shape, indices in groups.items():
        nframes, ndim = shape[0], shape[1]
        if nframes == 0:
            for i in indices:
                outputs[i] = np.zeros(
                    (0, (order + 1) * ndim), dtype=np.float32)
            continue
        row_bytes = max(1, 4 * nframes * ndim)
        batch_rows = max(1, (32 << 20) // row_bytes)
        for start in range(0, len(indices), batch_rows):
            chunk = indices[start:start + batch_rows]
            rows = len(chunk)
            padded = np.empty(
                (rows, nframes + 2 * max_offset, ndim), np.float32)
            for row, i in enumerate(chunk):
                data = np.asarray(arrays[i], dtype=np.float32)
                padded[row, max_offset:max_offset + nframes] = data
                padded[row, :max_offset] = data[0]
                padded[row, max_offset + nframes:] = data[-1]
            out = np.empty(
                (rows, nframes, (order + 1) * ndim), np.float32)
            tmp = np.empty((rows, nframes, ndim), np.float32)
            for k, scale in enumerate(scales):
                offset = k * window
                block = out[:, :, k * ndim:(k + 1) * ndim]
                for j, coeff in enumerate(scale):
                    shift = j - offset
                    src = padded[
                        :, max_offset + shift:
                        max_offset + shift + nframes]
                    if j == 0:
                        np.multiply(src, np.float32(coeff), out=block)
                    else:
                        np.multiply(src, np.float32(coeff), out=tmp)
                        block += tmp
            for row, i in enumerate(chunk):
                outputs[i] = out[row]
    return outputs


# --------------------------------------------------------------------- CMVN

def accumulate_cmvn_stats(feats, weights=None):
    """CMVN statistics of one features matrix, Kaldi layout.

    Returns a [2, dim+1] float64 array: row 0 = per-dim weighted sums
    with the total weight in the last column, row 1 = weighted sums of
    squares (last column zero).
    """
    feats = np.asarray(feats, dtype=np.float64)
    nframes, dim = feats.shape
    if weights is None:
        weights = np.ones(nframes)
    weights = np.asarray(weights, dtype=np.float64)

    stats = np.zeros((2, dim + 1))
    stats[0, :dim] = weights @ feats
    stats[1, :dim] = weights @ (feats * feats)
    stats[0, dim] = weights.sum()
    return stats


def apply_cmvn(feats, stats, norm_vars=True, skip_dims=None,
               reverse=False):
    """Apply accumulated CMVN statistics to a features matrix.

    Matches Kaldi's ApplyCmvn/ApplyCmvnReverse: per-dim affine
    transform from the mean (and optionally variance) encoded in
    ``stats``; ``skip_dims`` leaves the listed dimensions untouched.
    Like Kaldi, a non-positive variance floors to 1e-20 with a
    warning (the dimension is scaled by up to 1e10 — a constant
    feature dimension is almost certainly a caller bug) and a
    non-finite scale raises.
    """
    stats = np.asarray(stats, dtype=np.float64)
    dim = stats.shape[1] - 1
    count = stats[0, dim]

    mean = stats[0, :dim] / count
    if norm_vars:
        var = stats[1, :dim] / count - mean * mean
        floored = var < 1.0e-20
        if floored.any():
            import warnings
            warnings.warn(
                'flooring zero cepstral variance to 1e-20 in dims '
                f'{np.flatnonzero(floored).tolist()} (constant '
                'feature dimension?)')
        var = np.maximum(var, 1.0e-20)
        scale = 1.0 / np.sqrt(var)
        if not np.isfinite(scale).all():
            raise ValueError(
                'NaN or infinity in CMVN variance normalization')
    else:
        scale = np.ones(dim)
    offset = -mean * scale

    if skip_dims:
        scale = scale.copy()
        offset = offset.copy()
        scale[list(skip_dims)] = 1.0
        offset[list(skip_dims)] = 0.0

    feats = np.asarray(feats)
    if reverse:
        return ((feats - offset) / scale).astype(feats.dtype)
    return (feats * scale + offset).astype(feats.dtype)


# ------------------------------------------------------------- sliding CMVN

@functools.partial(
    jax.jit,
    static_argnames=('center', 'cmn_window', 'min_window',
                     'normalize_variance'))
def sliding_window_cmvn(feats, nframes, center=True, cmn_window=600,
                        min_window=100, normalize_variance=False):
    """Per-frame sliding-window mean (and variance) normalization.

    Implements Kaldi's SlidingWindowCmn window placement: a window of
    ``cmn_window`` frames centered on (or trailing) the current frame,
    shifted to stay inside the utterance, with ``min_window`` lookahead
    at the start in the non-centered case. Windowed sums come from
    prefix sums, one pass for the whole batch.
    """
    bsz, maxframes, dim = feats.shape
    n = nframes[:, None].astype(jnp.int32)  # [B, 1]
    t = jnp.arange(maxframes, dtype=jnp.int32)[None, :]  # [1, T]

    if center:
        start = t - cmn_window // 2
        end = start + cmn_window
    else:
        start = t - cmn_window
        end = t + 1

    # shift the window inside [0, n)
    end = jnp.where(start < 0, end - start, end)
    start = jnp.maximum(start, 0)
    if not center:
        end = jnp.where(end > t, jnp.maximum(t + 1, min_window), end)
    shift = jnp.maximum(end - n, 0)
    start = jnp.maximum(start - shift, 0)
    end = jnp.minimum(end, n)

    # windowed sums as prefix-sum differences; XLA's associative-scan
    # cumsum keeps the f32 error well below the 1e-3 parity budget for
    # realistic utterance lengths
    valid = (t < n)[:, :, None]
    feats32 = jnp.where(valid, feats, 0).astype(jnp.float32)
    csum = jnp.cumsum(feats32, axis=1)
    csumsq = jnp.cumsum(feats32 * feats32, axis=1)
    zeros = jnp.zeros((bsz, 1, dim), dtype=jnp.float32)
    csum = jnp.concatenate([zeros, csum], axis=1)
    csumsq = jnp.concatenate([zeros, csumsq], axis=1)

    def window_sum(cs):
        upper = jnp.take_along_axis(cs, end[:, :, None], axis=1)
        lower = jnp.take_along_axis(cs, start[:, :, None], axis=1)
        return upper - lower

    counts = (end - start).astype(jnp.float32)[:, :, None]
    counts = jnp.maximum(counts, 1.0)
    mean = window_sum(csum) / counts
    out = feats.astype(jnp.float32) - mean

    if normalize_variance:
        variance = window_sum(csumsq) / counts - mean * mean
        variance = jnp.maximum(variance, 1.0e-10)
        out = jnp.where(
            counts <= 1.0, 0.0, out * jax.lax.rsqrt(variance))

    return out.astype(feats.dtype)


# ---------------------------------------------------------------------- VAD

@functools.partial(
    jax.jit,
    static_argnames=('energy_threshold', 'energy_mean_scale',
                     'frames_context', 'proportion_threshold'))
def compute_vad_energy(log_energy, nframes, energy_threshold=5.0,
                       energy_mean_scale=0.5, frames_context=0,
                       proportion_threshold=0.6):
    """Energy-based voice activity detection (Kaldi ComputeVadEnergy).

    ``log_energy`` is [B, T] (column 0 of the input features); the
    decision for each frame is a proportion vote of frames above the
    cutoff within +-``frames_context`` frames.
    """
    bsz, maxframes = log_energy.shape
    n = nframes[:, None].astype(jnp.int32)
    t = jnp.arange(maxframes, dtype=jnp.int32)[None, :]
    valid = t < n

    cutoff = jnp.full((bsz, 1), float(energy_threshold))
    if energy_mean_scale != 0.0:
        mean = (
            jnp.sum(jnp.where(valid, log_energy, 0.0), axis=1,
                    keepdims=True)
            / jnp.maximum(n.astype(log_energy.dtype), 1))
        cutoff = cutoff + energy_mean_scale * mean

    above = jnp.where(valid, (log_energy > cutoff).astype(jnp.float32),
                      0.0)
    in_range = valid.astype(jnp.float32)

    num = jnp.zeros_like(above)
    den = jnp.zeros_like(above)
    for offset in range(-frames_context, frames_context + 1):
        num = num + jnp.roll(above, -offset, axis=1) * _shift_mask(
            t, n, offset)
        den = den + jnp.roll(in_range, -offset, axis=1) * _shift_mask(
            t, n, offset)

    # the threshold comparison stays in float32 on purpose: Kaldi's
    # ComputeVadEnergy does num >= den * proportion in BaseFloat
    # (f32), so boundary frames round the same way here
    return (num >= den * proportion_threshold).astype(jnp.uint8)


def _shift_mask(t, n, offset):
    """1 where frame t+offset is a valid frame index, else 0"""
    shifted = t + offset
    return ((shifted >= 0) & (shifted < n)).astype(jnp.float32)
