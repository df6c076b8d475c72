"""Batched PLP / RASTA-PLP computer.

Replaces the per-frame Python/pykaldi PLP recipe of the reference
(``shennong/processor/plp.py:510-626``: powspec -> mel -> optional
RASTA IIR -> equal-loudness -> power-law compression -> IDFT ->
Levinson-Durbin LPC -> LPC-to-cepstrum -> liftering) with one jitted
XLA program. The Durbin recursion and the cepstrum recursion are
statically unrolled over the (small) LPC order; the RASTA filter runs
as a ``lax.scan`` over frames carrying the direct-form-II-transposed
state, reproducing the reference's 4-frame warm-up semantics
(``shennong/processor/plp.py:128-140``).
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from shennong_tpu.ops import mel as melmod
from shennong_tpu.ops.framing import FrameOptions
from shennong_tpu.ops.spectral import MelOpts

DBL_EPSILON = float(np.finfo(np.float64).eps)

# RASTA bandpass filter: numerator [-2..2]/sum(j^2), denominator [1, -0.94]
_RASTA_NUM = (-np.arange(-2, 3) / np.sum(np.arange(-2, 3) ** 2)).astype(
    np.float32)
_RASTA_DEN1 = -0.94  # a1 coefficient


@dataclasses.dataclass(frozen=True)
class PlpOpts:
    frame: FrameOptions = FrameOptions()
    mel: MelOpts = MelOpts()
    rasta: bool = False
    lpc_order: int = 12
    num_ceps: int = 13
    use_energy: bool = True
    energy_floor: float = 0.0
    raw_energy: bool = True
    compress_factor: float = 1.0 / 3.0
    cepstral_lifter: float = 22.0
    cepstral_scale: float = 1.0
    htk_compat: bool = False


def _lfilter_zi_fir(num):
    """scipy.signal.lfilter_zi for a pure-FIR filter: steady-state
    direct-form-II-transposed state for a unit step input."""
    # z[i] = sum of taps after position i
    return np.cumsum(num[::-1])[::-1][1:].astype(np.float32)


def rasta_filter(log_mel):
    """RASTA filtering in the log domain, frame-recursive.

    ``log_mel`` is [B, F, M]. The first four output frames are zero
    (the reference emits zeros while buffering the warm-up frames);
    the filter state is initialized from those four frames with an
    FIR pass seeded by scipy's steady-state initial conditions.
    """
    bsz, nframes, nbins = log_mel.shape
    num = _RASTA_NUM

    # initial state: steady-state FIR conditions scaled by frame 0
    zi0 = jnp.asarray(_lfilter_zi_fir(num))  # [4]
    state = zi0[None, :, None] * log_mel[:, 0:1, :]  # [B, 4, M]

    # warm-up: FIR only (denominator 1) over the first four frames
    nwarm = min(4, nframes)
    for i in range(nwarm):
        x = log_mel[:, i, :]
        # y = num[0] * x + state[0]   (output discarded: zeros emitted)
        y = num[0] * x + state[:, 0, :]
        state = jnp.stack([
            num[1] * x + state[:, 1, :],
            num[2] * x + state[:, 2, :],
            num[3] * x + state[:, 3, :],
            num[4] * x], axis=1)
        del y

    if nframes <= 4:
        return jnp.zeros_like(log_mel)

    # main phase: IIR with denominator [1, -0.94], scanned over frames
    def step(z, x):
        y = num[0] * x + z[:, 0, :]
        new_z = jnp.stack([
            num[1] * x + z[:, 1, :] - _RASTA_DEN1 * y,
            num[2] * x + z[:, 2, :],
            num[3] * x + z[:, 3, :],
            num[4] * x], axis=1)
        return new_z, y

    xs = log_mel[:, 4:, :].transpose(1, 0, 2)  # [F-4, B, M]
    _, ys = jax.lax.scan(step, state, xs)
    ys = ys.transpose(1, 0, 2)  # [B, F-4, M]

    zeros = jnp.zeros((bsz, 4, nbins), log_mel.dtype)
    return jnp.concatenate([zeros, ys], axis=1)


def durbin(autocorr, order):
    """Levinson-Durbin recursion, statically unrolled over ``order``.

    ``autocorr`` is [..., order+1]; returns (lpc [..., order],
    residual_energy [...]). Matches Kaldi's Durbin routine including
    the 1e-5 floor on the prediction-error update factor.
    """
    energy = autocorr[..., 0]
    lpc = []
    for i in range(order):
        ki = autocorr[..., i + 1]
        for j in range(i):
            ki = ki + lpc[j] * autocorr[..., i - j]
        ki = ki / energy
        clamp = jnp.maximum(1.0 - ki * ki, 1.0e-5)
        energy = energy * clamp
        new_lpc = [lpc[j] - ki * lpc[i - j - 1] for j in range(i)]
        new_lpc.append(-ki)
        lpc = new_lpc
    return jnp.stack(lpc, axis=-1), energy


def lpc_to_cepstrum(lpc, order):
    """Kaldi Lpc2Cepstrum, statically unrolled."""
    cepstrum = []
    for i in range(order):
        acc = 0.0
        for j in range(i):
            acc = acc + (i - j) * lpc[..., j] * cepstrum[i - j - 1]
        cepstrum.append(-lpc[..., i] - acc / (i + 1))
    return jnp.stack(cepstrum, axis=-1)


@functools.partial(jax.jit, static_argnames=('opts', 'nframes_max'))
def plp_batch(signals, nsamples, mel_weights, equal_loudness, opts,
              nframes_max, key=None):
    """PLP features [B, nframes_max, num_ceps]."""
    from shennong_tpu.ops.spectral import _mel_apply, _power_and_energy
    power, log_energy = _power_and_energy(
        signals, nsamples, opts, nframes_max, key)
    mel_energies = _mel_apply(power, mel_weights)

    if opts.rasta:
        log_mel = jnp.log(mel_energies + np.finfo(np.float32).eps)
        mel_energies = jnp.exp(rasta_filter(log_mel))

    # equal_loudness broadcasts for both [M] and per-utterance [B, M]
    if equal_loudness.ndim == 2:
        equal_loudness = equal_loudness[:, None, :]
    mel_energies = mel_energies * equal_loudness
    mel_energies = jnp.power(mel_energies, opts.compress_factor)

    # duplicate first and last mel bins, then IDFT to autocorrelations
    duplicated = jnp.concatenate([
        mel_energies[..., :1], mel_energies, mel_energies[..., -1:]],
        axis=-1)
    idft = jnp.asarray(melmod.idft_bases(
        opts.lpc_order + 1, opts.mel.num_bins + 2))
    autocorr = jnp.einsum(
        'bfm,cm->bfc', duplicated, idft,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    lpc, residual = durbin(autocorr, opts.lpc_order)
    # Kaldi's ComputeLpc returns -log(1/E) / 2 = 0.5 * log(E)
    # ("forms the C0 value", mel-computations.cc), which the
    # reference floors with DBL epsilon in the LOG domain
    # (shennong/processor/plp.py:601-603) — note the floor applies
    # to the log value, not the energy, and the half factor is part
    # of the contract (visible as C0 when use_energy=False)
    residual_log_energy = jnp.maximum(
        0.5 * jnp.log(residual), DBL_EPSILON)

    cepstrum = lpc_to_cepstrum(lpc, opts.lpc_order)

    feats = jnp.concatenate([
        residual_log_energy[..., None],
        cepstrum[..., :opts.num_ceps - 1]], axis=-1)

    if opts.cepstral_lifter != 0.0:
        feats = feats * jnp.asarray(melmod.lifter_coeffs(
            opts.cepstral_lifter, opts.num_ceps))
    if opts.cepstral_scale != 1.0:
        feats = feats * opts.cepstral_scale

    if opts.use_energy:
        if opts.energy_floor > 0.0:
            log_energy = jnp.maximum(
                log_energy, math.log(opts.energy_floor))
        feats = feats.at[..., 0].set(log_energy)

    if opts.htk_compat:
        # plain rotation with NO sqrt(2) energy scaling: PLP differs
        # from MFCC here, in the reference
        # (shennong/processor/plp.py:622-626) as in Kaldi
        feats = jnp.concatenate(
            [feats[..., 1:], feats[..., :1]], axis=-1)

    return feats
