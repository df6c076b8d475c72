"""Fused batched computers: spectrogram, filterbank, MFCC, energy.

Each computer replaces one Kaldi C++ pipeline (``kaldi.feat.mfcc.Mfcc``
at ``shennong/processor/mfcc.py:86``, ``kaldi.feat.fbank.Fbank`` at
``shennong/processor/filterbank.py:84``,
``kaldi.feat.spectrogram.Spectrogram`` at
``shennong/processor/spectrogram.py:139`` and the per-frame energy loop
at ``shennong/processor/energy.py:172-183``) with a single jitted XLA
program over a padded batch: frame gather -> window processing ->
batched rFFT -> power spectrum -> mel/DCT matmuls (MXU) -> liftering
and energy columns, all fused by XLA.
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from shennong_tpu.ops import framing
from shennong_tpu.ops.framing import FLT_EPSILON, FrameOptions

_SQRT2 = math.sqrt(2.0)


@dataclasses.dataclass(frozen=True)
class SpectrogramOpts:
    frame: FrameOptions = FrameOptions()
    energy_floor: float = 0.0
    raw_energy: bool = True


@dataclasses.dataclass(frozen=True)
class MelOpts:
    num_bins: int = 23
    low_freq: float = 20.0
    high_freq: float = 0.0
    vtln_low: float = 100.0
    vtln_high: float = -500.0


@dataclasses.dataclass(frozen=True)
class FbankOpts:
    frame: FrameOptions = FrameOptions()
    mel: MelOpts = MelOpts()
    use_energy: bool = False
    energy_floor: float = 0.0
    raw_energy: bool = True
    htk_compat: bool = False
    use_log_fbank: bool = True
    use_power: bool = True


@dataclasses.dataclass(frozen=True)
class MfccOpts:
    frame: FrameOptions = FrameOptions()
    mel: MelOpts = MelOpts()
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    raw_energy: bool = True
    cepstral_lifter: float = 22.0
    htk_compat: bool = False


@functools.lru_cache(maxsize=None)
def _dft_bases(width, padded_size):
    """First ``width`` rows of the cos/sin bases of a real
    ``padded_size``-point DFT (the zero padding of the frames never
    mixes into other rows, so the tail rows are dropped)."""
    k = np.arange(padded_size // 2 + 1)
    n = np.arange(width)
    ang = 2.0 * np.pi * np.outer(n, k) / padded_size
    return (np.cos(ang).astype(np.float32),
            (-np.sin(ang)).astype(np.float32))


def power_spectrum(frames, padded_size):
    """|rfft|^2 of processed frames: [B, F, W] -> [B, F, P//2 + 1].

    On TPU the real DFT runs as two cos/sin matmuls on the MXU —
    measured 2.3x faster than the XLA FFT at MFCC sizes
    ([64, 998, 512]), with the same ~2e-7 relative error against a
    float64 FFT. Other backends keep ``jnp.fft.rfft``.
    """
    if jax.default_backend() == 'tpu':
        return power_spectrum_matmul(frames, padded_size)
    spectrum = jnp.fft.rfft(frames, n=padded_size, axis=-1)
    return jnp.real(spectrum) ** 2 + jnp.imag(spectrum) ** 2


def power_spectrum_matmul(frames, padded_size):
    """The power spectrum as two real-DFT matmuls (MXU path)."""
    cos_m, sin_m = _dft_bases(frames.shape[-1], padded_size)
    real = jnp.einsum(
        '...w,wk->...k', frames, jnp.asarray(cos_m),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    imag = jnp.einsum(
        '...w,wk->...k', frames, jnp.asarray(sin_m),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return real * real + imag * imag


def _frames_and_energy(signals, nsamples, opts, nframes_max, key):
    """Common front-end: gather frames, process, pick the log energy.

    Returns (processed_frames, log_energy) where log_energy is the raw
    (pre-window) or windowed energy according to ``raw_energy``.
    """
    frames = framing.extract_frames(
        signals, nsamples, opts.frame, nframes_max)
    processed, raw_log_energy = framing.process_frames(
        frames, opts.frame, key=key)
    if opts.raw_energy:
        log_energy = raw_log_energy
    else:
        log_energy = framing.windowed_log_energy(processed)
    return processed, log_energy


@functools.lru_cache(maxsize=None)
def _folded_dft_bases(window_type, blackman_coeff, window_size,
                      padded_size, preemph_coeff, remove_dc):
    """DFT bases with the linear per-frame processing folded in.

    DC-offset removal, pre-emphasis and the analysis window are all
    linear per-frame operators, so (in row-vector convention) the
    chain collapses into the DFT matrices:
        x_processed @ C  ==  x_raw @ (Mdc Mpre diag(win) C)
    Built in float64 on the host; one matmul then replaces four
    elementwise passes over the [B, F, W] frame tensor.
    """
    win = framing.window_function(
        window_type, window_size, blackman_coeff).astype(np.float64)
    combined = np.diag(win)
    if preemph_coeff != 0.0:
        pre = np.eye(window_size)
        idx = np.arange(1, window_size)
        pre[idx - 1, idx] -= preemph_coeff
        pre[0, 0] *= (1.0 - preemph_coeff)
        combined = pre @ combined
    if remove_dc:
        combined = combined - (
            combined.sum(axis=0, keepdims=True) / window_size)
    cos_m, sin_m = _dft_bases(window_size, padded_size)
    return ((combined @ cos_m).astype(np.float32),
            (combined @ sin_m).astype(np.float32))


def _power_and_energy(signals, nsamples, opts, nframes_max, key):
    """Power spectrum + frame log energy, the fastest way available.

    On TPU with ``raw_energy`` (the default) the per-frame processing
    chain folds into the DFT matmul (see :func:`_folded_dft_bases`)
    and the raw energy comes from the frame sum / sum-of-squares
    (energy after DC removal = ssq - s^2 / N), so the raw frames are
    read exactly once. Other configurations use the sequential chain.
    """
    frame = opts.frame
    if jax.default_backend() == 'tpu' and opts.raw_energy:
        raw = framing.extract_frames(
            signals, nsamples, frame, nframes_max)
        if frame.dither != 0.0 and key is None:
            # same contract as framing.process_frames: never skip a
            # configured dither silently
            raise ValueError(
                'opts.dither is non-zero but no PRNG key was '
                'provided')
        if frame.dither != 0.0:
            raw = raw + frame.dither * jax.random.normal(
                key, raw.shape, dtype=raw.dtype)
        if frame.remove_dc_offset:
            # energy of the DC-removed frame, summed over CENTERED
            # values like the sequential path: the algebraic
            # ssq - s^2/N form catastrophically cancels in float32
            # for DC-offset frames (a bias of 1e4 makes both terms
            # ~1e10 and their float32 difference pure noise)
            mean = jnp.mean(raw, axis=-1, keepdims=True)
            ssq = jnp.sum(jnp.square(raw - mean), axis=-1)
        else:
            ssq = jnp.sum(raw * raw, axis=-1)
        log_energy = jnp.log(jnp.maximum(ssq, FLT_EPSILON))

        cos_m, sin_m = _folded_dft_bases(
            frame.window_type, frame.blackman_coeff,
            frame.window_size, frame.padded_window_size,
            frame.preemph_coeff, frame.remove_dc_offset)
        real = jnp.einsum(
            '...w,wk->...k', raw, jnp.asarray(cos_m),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        imag = jnp.einsum(
            '...w,wk->...k', raw, jnp.asarray(sin_m),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        return real * real + imag * imag, log_energy

    processed, log_energy = _frames_and_energy(
        signals, nsamples, opts, nframes_max, key)
    return (power_spectrum(processed, frame.padded_window_size),
            log_energy)


def _floor_energy(log_energy, energy_floor):
    if energy_floor > 0.0:
        return jnp.maximum(log_energy, math.log(energy_floor))
    return log_energy


def _mel_apply(power, mel_weights):
    """Power spectrum -> mel energies; supports a shared [M, P] matrix
    or per-utterance [B, M, P] matrices (per-utterance VTLN warps in
    one batch)."""
    subscripts = 'bfp,bmp->bfm' if mel_weights.ndim == 3 else 'bfp,mp->bfm'
    return jnp.einsum(
        subscripts, power, mel_weights,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


@functools.partial(
    jax.jit, static_argnames=('opts', 'nframes_max'))
def spectrogram_batch(signals, nsamples, opts, nframes_max, key=None):
    """Log power spectrum, column 0 replaced by the frame log energy.

    Output shape [B, nframes_max, padded_window_size // 2 + 1].
    """
    power, log_energy = _power_and_energy(
        signals, nsamples, opts, nframes_max, key)
    feats = jnp.log(jnp.maximum(power, FLT_EPSILON))
    log_energy = _floor_energy(log_energy, opts.energy_floor)
    return feats.at[..., 0].set(log_energy)


@functools.partial(
    jax.jit, static_argnames=('opts', 'nframes_max'))
def fbank_batch(signals, nsamples, mel_weights, opts, nframes_max,
                key=None):
    """Mel filterbank features, optional energy column.

    Output dim is num_bins (+1 with energy); the energy column sits
    first, or last in HTK-compatible mode.
    """
    power, log_energy = _power_and_energy(
        signals, nsamples, opts, nframes_max, key)
    if not opts.use_power:
        power = jnp.sqrt(power)

    mel_energies = _mel_apply(power, mel_weights)
    if opts.use_log_fbank:
        mel_energies = jnp.log(jnp.maximum(mel_energies, FLT_EPSILON))

    if not opts.use_energy:
        return mel_energies

    log_energy = _floor_energy(
        log_energy, opts.energy_floor)[..., None]
    if opts.htk_compat:
        return jnp.concatenate([mel_energies, log_energy], axis=-1)
    return jnp.concatenate([log_energy, mel_energies], axis=-1)


@functools.partial(
    jax.jit, static_argnames=('opts', 'nframes_max'))
def mfcc_batch(signals, nsamples, mel_weights, opts, nframes_max,
               key=None):
    """MFCC features [B, nframes_max, num_ceps].

    Pipeline: frames -> rFFT -> power -> mel matmul -> log -> DCT-II
    matmul -> cepstral lifter -> energy/C0 handling -> HTK reorder.
    """
    from shennong_tpu.ops import mel as melmod

    power, log_energy = _power_and_energy(
        signals, nsamples, opts, nframes_max, key)

    mel_energies = _mel_apply(power, mel_weights)
    log_mel = jnp.log(jnp.maximum(mel_energies, FLT_EPSILON))

    dct = jnp.asarray(
        melmod.dct_matrix(opts.num_ceps, opts.mel.num_bins))
    feats = jnp.einsum(
        'bfm,cm->bfc', log_mel, dct,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(
            melmod.lifter_coeffs(opts.cepstral_lifter, opts.num_ceps))

    if opts.use_energy:
        log_energy = _floor_energy(log_energy, opts.energy_floor)
        feats = feats.at[..., 0].set(log_energy)

    if opts.htk_compat:
        first = feats[..., :1]
        if not opts.use_energy:
            first = first * _SQRT2  # C0 scaling for HTK
        feats = jnp.concatenate([feats[..., 1:], first], axis=-1)

    return feats


@functools.partial(
    jax.jit, static_argnames=('opts', 'nframes_max'))
def mfcc_multi_warp_batch(signals, nsamples, mel_weights, opts,
                          nframes_max, key=None):
    """MFCC for every VTLN warp class in one program.

    ``mel_weights`` is a [C, M, P] stack of warped mel banks; the
    framing and the DFT run once and only the mel application fans
    out over classes. Output [C, B, nframes_max, num_ceps]. This is
    the kernel behind LVTLN base-transform training (41 warp classes
    over the same signals, reference shennong/processor/vtln.py:
    259-381).
    """
    from shennong_tpu.ops import mel as melmod

    power, log_energy = _power_and_energy(
        signals, nsamples, opts, nframes_max, key)

    mel_energies = jnp.einsum(
        'bfp,cmp->cbfm', power, mel_weights,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    log_mel = jnp.log(jnp.maximum(mel_energies, FLT_EPSILON))

    dct = jnp.asarray(
        melmod.dct_matrix(opts.num_ceps, opts.mel.num_bins))
    feats = jnp.einsum(
        'cbfm,km->cbfk', log_mel, dct,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(
            melmod.lifter_coeffs(opts.cepstral_lifter, opts.num_ceps))

    if opts.use_energy:
        log_energy = _floor_energy(log_energy, opts.energy_floor)
        feats = feats.at[..., 0].set(
            jnp.broadcast_to(log_energy, feats.shape[:-1]))

    if opts.htk_compat:
        first = feats[..., :1]
        if not opts.use_energy:
            first = first * _SQRT2
        feats = jnp.concatenate([feats[..., 1:], first], axis=-1)

    return feats


@functools.partial(
    jax.jit, static_argnames=('opts', 'nframes_max', 'compression'))
def energy_batch(signals, nsamples, opts, nframes_max,
                 compression='log', key=None):
    """Frame energies with 'log', 'sqrt' or 'off' compression.

    The ``raw_energy`` semantics of the reference (pre-emphasis off and
    rectangular window) are handled by the caller through ``opts``.
    """
    frames = framing.extract_frames(
        signals, nsamples, opts.frame, nframes_max)
    processed, _ = framing.process_frames(frames, opts.frame, key=key)
    # floor with the smallest *float32* normal (the reference floors
    # with the float64 tiny, which underflows to zero in f32 and would
    # send log() to -inf on digitally silent frames)
    energy = jnp.maximum(
        jnp.sum(processed * processed, axis=-1),
        np.finfo(np.float32).tiny)
    if compression == 'log':
        return jnp.log(energy)
    if compression == 'sqrt':
        return jnp.sqrt(energy)
    return energy


@dataclasses.dataclass(frozen=True)
class EnergyOpts:
    frame: FrameOptions = FrameOptions()
    raw_energy: bool = True
    compression: str = 'log'
