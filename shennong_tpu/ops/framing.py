"""Frame extraction and windowing, Kaldi ``feature-window`` semantics.

Replaces ``kaldi.feat.window`` (used by the reference in
``shennong/processor/base.py:130`` and ``shennong/frames.py``): frame
boundary math, the five window functions, dithering, DC removal,
pre-emphasis and raw-energy computation — implemented as one batched,
fusable XLA computation over ``[batch, num_frames, window]`` tensors
instead of a per-frame C++ loop.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

# float32 machine epsilon, the energy floor used throughout Kaldi
FLT_EPSILON = float(np.finfo(np.float32).eps)

WINDOW_TYPES = ('hamming', 'hanning', 'povey', 'rectangular', 'blackman')


@dataclasses.dataclass(frozen=True)
class FrameOptions:
    """Static framing parameters (hashable, used as a jit static arg).

    Field semantics follow Kaldi's FrameExtractionOptions.
    """
    sample_rate: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    dither: float = 1.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = 'povey'
    round_to_power_of_two: bool = True
    blackman_coeff: float = 0.42
    snip_edges: bool = True

    @property
    def window_size(self):
        """Samples per frame (truncating, like Kaldi)"""
        return int(self.sample_rate * 0.001 * self.frame_length_ms)

    @property
    def window_shift(self):
        """Samples between frame starts"""
        return int(self.sample_rate * 0.001 * self.frame_shift_ms)

    @property
    def padded_window_size(self):
        """Frame size after optional zero-padding to a power of two"""
        if self.round_to_power_of_two:
            return next_power_of_two(self.window_size)
        return self.window_size


def next_power_of_two(n):
    """Smallest power of two >= n"""
    return 1 << (int(n) - 1).bit_length()


def num_frames(nsamples, opts, flush=True):
    """Number of frames extractable from ``nsamples`` samples.

    Implements Kaldi's NumFrames: with ``snip_edges`` only frames that
    fit entirely in the signal are counted; otherwise the frame count
    depends on the shift only and edges are reflected.
    """
    shift, length = opts.window_shift, opts.window_size
    if opts.snip_edges:
        if nsamples < length:
            return 0
        return 1 + (nsamples - length) // shift

    nframes = (nsamples + shift // 2) // shift
    if flush:
        return nframes
    end = first_sample_of_frame(nframes - 1, opts) + length
    while nframes > 0 and end > nsamples:
        nframes -= 1
        end -= shift
    return nframes


def first_sample_of_frame(frame, opts):
    """Index of the first sample of ``frame`` (may be negative when
    ``snip_edges`` is False)."""
    shift = opts.window_shift
    if opts.snip_edges:
        return frame * shift
    midpoint = shift * frame + shift // 2
    return midpoint - opts.window_size // 2


@functools.lru_cache(maxsize=None)
def window_function(window_type, window_size, blackman_coeff=0.42):
    """The window vector, one of the five Kaldi window types.

    Formulas (N = window_size, a = 2*pi/(N-1)):
      hanning     0.5 - 0.5 cos(a n)
      hamming     0.54 - 0.46 cos(a n)
      povey       (0.5 - 0.5 cos(a n)) ** 0.85
      rectangular 1
      blackman    c - 0.5 cos(a n) + (0.5 - c) cos(2 a n)
    """
    if window_type not in WINDOW_TYPES:
        raise ValueError(
            'window type must be in {}, it is {}'.format(
                WINDOW_TYPES, window_type))

    n = np.arange(window_size, dtype=np.float64)
    a = 2 * math.pi / max(window_size - 1, 1)
    if window_type == 'hanning':
        win = 0.5 - 0.5 * np.cos(a * n)
    elif window_type == 'hamming':
        win = 0.54 - 0.46 * np.cos(a * n)
    elif window_type == 'povey':
        win = (0.5 - 0.5 * np.cos(a * n)) ** 0.85
    elif window_type == 'rectangular':
        win = np.ones_like(n)
    else:  # blackman
        win = (blackman_coeff - 0.5 * np.cos(a * n)
               + (0.5 - blackman_coeff) * np.cos(2 * a * n))
    return win.astype(np.float32)


def _reflect_indices(indices, nsamples):
    """Map sample indices into [0, nsamples) by boundary reflection.

    Kaldi reflects around signal edges in a loop
    (-1 -> 0, n -> n-1, ... until in range); the loop's fixed point
    is the symmetric extension of period ``2 * nsamples``, so the
    closed form below is exact for ANY index magnitude — a bounded
    number of unrolled rounds would clip (and silently diverge from
    Kaldi) once the window exceeds twice the signal length.
    """
    period = jnp.maximum(2 * nsamples, 1)  # guard zero-length rows
    folded = jnp.mod(indices, period)
    reflected = jnp.where(
        folded >= nsamples, 2 * nsamples - 1 - folded, folded)
    return jnp.clip(reflected, 0, jnp.maximum(nsamples - 1, 0))


@functools.partial(jax.jit, static_argnames=('opts', 'nframes_max'))
def extract_frames(signals, nsamples, opts, nframes_max):
    """Extract raw (unprocessed) frames from a padded signal batch.

    Parameters
    ----------
    signals : [batch, time] float32, samples in int16 range
    nsamples : [batch] int32, true per-utterance sample counts
    opts : FrameOptions (static)
    nframes_max : int (static), frames to extract per utterance

    Returns
    -------
    frames : [batch, nframes_max, window_size] float32

    With ``snip_edges`` every valid frame lies entirely inside its
    signal, so frames assemble from plain strided slices (the padding
    region yields zero frames beyond each utterance's true frame
    count, which callers discard). Without ``snip_edges`` the edge
    frames reflect around the signal boundaries, which requires the
    general gather path.
    """
    size = opts.window_size
    shift = opts.window_shift

    # int16 uploads (half the host-device bytes) widen on device
    signals = signals.astype(jnp.float32)

    if opts.snip_edges:
        # slice-and-concat framing: chunk the signal into shift-sized
        # blocks, a frame is ceil(size/shift) consecutive (trimmed)
        # blocks — pure reshapes/slices, no gather
        needed = (nframes_max + size // shift + 1) * shift
        if signals.shape[1] < needed:
            signals = jnp.pad(
                signals, ((0, 0), (0, needed - signals.shape[1])))
        elif signals.shape[1] % shift:
            signals = jnp.pad(
                signals,
                ((0, 0), (0, shift - signals.shape[1] % shift)))
        chunks = signals.reshape(signals.shape[0], -1, shift)
        pieces = [
            chunks[:, j:j + nframes_max] for j in range(size // shift)]
        if size % shift:
            pieces.append(
                chunks[:, size // shift:size // shift + nframes_max,
                       :size % shift])
        return jnp.concatenate(pieces, axis=-1)

    starts = (
        jnp.arange(nframes_max, dtype=jnp.int32) * shift
        + shift // 2 - size // 2)
    indices = starts[:, None] + jnp.arange(size, dtype=jnp.int32)[None, :]

    # per-utterance reflection against the true signal length
    indices = _reflect_indices(
        indices[None, :, :], nsamples[:, None, None].astype(jnp.int32))

    return jnp.take_along_axis(
        signals[:, None, :], indices.reshape(
            signals.shape[0], -1)[:, None, :], axis=2
    ).reshape(signals.shape[0], nframes_max, size)


def process_frames(frames, opts, key=None):
    """Apply the Kaldi per-frame processing chain to raw frames.

    Order (matching Kaldi ProcessWindow): dither, DC-offset removal,
    raw energy, pre-emphasis, window multiplication, zero-padding to
    the padded window size.

    Parameters
    ----------
    frames : [batch, nframes, window_size] float32
    opts : FrameOptions
    key : optional PRNG key for dithering (required if opts.dither != 0)

    Returns
    -------
    padded : [batch, nframes, padded_window_size] float32
    raw_log_energy : [batch, nframes] float32, log energy measured
        after DC removal but before pre-emphasis and windowing
    """
    size = opts.window_size

    if opts.dither != 0.0 and key is None:
        # enforce the documented contract instead of silently
        # skipping the dither (undithered digital silence produces
        # log(eps) energy spikes Kaldi's always-on dither prevents)
        raise ValueError(
            'opts.dither is non-zero but no PRNG key was provided')
    if opts.dither != 0.0:
        frames = frames + opts.dither * jax.random.normal(
            key, frames.shape, dtype=frames.dtype)

    if opts.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    raw_log_energy = jnp.log(
        jnp.maximum(jnp.sum(frames * frames, axis=-1), FLT_EPSILON))

    if opts.preemph_coeff != 0.0:
        previous = jnp.concatenate(
            [frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - opts.preemph_coeff * previous

    win = jnp.asarray(window_function(
        opts.window_type, size, opts.blackman_coeff))
    frames = frames * win

    pad = opts.padded_window_size - size
    if pad > 0:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))

    return frames, raw_log_energy


def windowed_log_energy(frames):
    """Log energy of already-processed (windowed) frames."""
    return jnp.log(
        jnp.maximum(jnp.sum(frames * frames, axis=-1), FLT_EPSILON))


def bucket_size(n, minimum=4096, ratio=1.25):
    """Round ``n`` up to a geometric bucket to bound recompilations.

    Single-utterance calls pad the signal to the bucket size so that
    the jit cache is keyed by O(log T) distinct shapes instead of one
    entry per distinct utterance length.
    """
    size = minimum
    while size < n:
        size = int(math.ceil(size * ratio))
    return size
