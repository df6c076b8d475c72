"""Pallas TPU kernel for the pitch Viterbi forward recursion.

Implements the frame-recursive lag selection of Kaldi pitch
(reference call site ``shennong/processor/pitch_kaldi.py:298``).
The forward min-plus pass dominates the pitch tracker: F sequential
steps of ``new[b, j] = cost[b, j] + min_i(fwd[b, i] + penalty[j, i])``
over L ~ 417 lag states. As a ``lax.scan`` each step pays kernel
launch and HBM carry traffic; here the whole recursion runs as ONE
``pallas_call`` with a sequential grid over (frame, batch-tile): the
forward state lives in a VMEM scratch across grid steps, the penalty
matrix stays VMEM-resident, and each step streams only its local-cost
block in and its history block out.

The history of forward states (needed by the O(L) backward
backtrace) is written to HBM incrementally through the output
BlockSpec pipeline.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BATCH_TILE = 8
_BIG = 1e30


def _pick_batch_tile(bp):
    """Largest tile (up to 64 rows) dividing the padded batch: fewer
    sequential grid steps pipeline better (measured ~10% on the
    64-utterance bench at tile 64 vs 8)."""
    for tile in (64, 32, 16, 8):
        if bp % tile == 0:
            return min(tile, bp)
    return bp


def _make_viterbi_kernel(batch_tile):
    def _viterbi_kernel(cost_ref, bounds_ref, penalty_ref, hist_ref,
                        fwd_scratch):
        """One grid step: advance the forward costs of one batch tile
        by one frame and record the updated state."""
        frame = pl.program_id(0)
        tile = pl.program_id(1)

        cost = cost_ref[0]  # [Bt, L]
        tile_slice = pl.ds(tile * batch_tile, batch_tile)

        @pl.when(frame == 0)
        def _init():
            first = cost - jnp.min(cost, axis=1, keepdims=True)
            fwd_scratch[tile_slice, :] = first

        @pl.when(frame > 0)
        def _step():
            fwd = fwd_scratch[tile_slice, :]  # [Bt, L]
            # [Bt, Lc, Lp]: reduce over the previous-lag (minor) axis
            total = fwd[:, None, :] + penalty_ref[...][None, :, :]
            new = cost + jnp.min(total, axis=2)
            new = new - jnp.min(new, axis=1, keepdims=True)

            # padded frames pass the state through unchanged
            in_range = frame.astype(jnp.float32) < bounds_ref[...]
            new = jnp.where(in_range, new, fwd)
            fwd_scratch[tile_slice, :] = new

        hist_ref[0, :, :] = fwd_scratch[tile_slice, :]

    return _viterbi_kernel


@functools.partial(
    jax.jit, static_argnames=('interpret', 'keep_padding'))
def viterbi_forward_pallas(local_cost, penalty, nframes,
                           interpret=False, keep_padding=False):
    """Run the forward recursion, returning every forward state.

    Parameters
    ----------
    local_cost : [B, F, L] float32
    penalty : [L, L] float32 transition costs (symmetric)
    nframes : [B] int32 valid frame counts
    interpret : bool, static
        Run in the Pallas interpreter (for CPU testing).
    keep_padding : bool, static
        Return the padded [F, bp, lp] history (for the backtrace
        kernel) instead of slicing back to [F, B, L].

    Returns
    -------
    hist : [F, B, L] float32, the forward costs after each frame
        (hist[-1] are the final costs to start the backtrace from).
    """
    bsz, maxframes, nlags = local_cost.shape

    pad_b = (-bsz) % _BATCH_TILE
    pad_l = (-nlags) % _LANE
    batch_tile = _pick_batch_tile(bsz + pad_b)
    if pad_b or pad_l:
        local_cost = jnp.pad(
            local_cost, ((0, pad_b), (0, 0), (0, pad_l)),
            constant_values=_BIG)
        penalty = jnp.pad(
            penalty, ((0, pad_l), (0, pad_l)), constant_values=_BIG)
        nframes = jnp.pad(nframes, (0, pad_b))
    bp, lp = bsz + pad_b, nlags + pad_l

    # frame-major layout so VMEM blocks end in the (batch, lag) tile
    local_cost = local_cost.transpose(1, 0, 2)  # [F, B, L]

    # per-row frame bounds as a [bp, 1] float32 column (VMEM friendly)
    bounds = nframes.astype(jnp.float32)[:, None]

    grid = (maxframes, bp // batch_tile)

    hist = pl.pallas_call(
        _make_viterbi_kernel(batch_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, batch_tile, lp),
                lambda f, t: (f, t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (batch_tile, 1), lambda f, t: (t, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (lp, lp), lambda f, t: (0, 0),
                memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, batch_tile, lp), lambda f, t: (f, t, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (maxframes, bp, lp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, lp), jnp.float32)],
        interpret=interpret,
    )(local_cost, bounds, penalty)

    if keep_padding:
        return hist
    return hist[:, :bsz, :nlags]


def _make_backtrace_kernel(maxframes, nlags, factor):
    def _backtrace_kernel(hist_ref, bounds_ref, best_ref, state):
        """Grid step f emits the best lag of frame t = F-1-f (the
        BlockSpec index maps stream the history in reverse)."""
        f = pl.program_id(0)
        fwd_t = hist_ref[0]  # [bp, lp]
        bp, lp = fwd_t.shape

        # padded lanes hold ~1e30 forward costs and never win argmin
        lane = jax.lax.broadcasted_iota(
            jnp.int32, (bp, lp), 1).astype(jnp.float32)

        @pl.when(f == 0)
        def _last_frame():
            best = jnp.argmin(fwd_t, axis=1)[:, None]
            state[...] = best.astype(jnp.float32)

        @pl.when(f > 0)
        def _step():
            best_next = state[...]  # [bp, 1] float32
            diff = best_next - lane
            scores = fwd_t + diff * diff * factor
            best = jnp.argmin(scores, axis=1)[:, None].astype(
                jnp.float32)
            # frame t+1 = F-f is padding when F-f >= nframes: the
            # backtrace state passes through unchanged
            t_next = jnp.float32(maxframes) - f.astype(jnp.float32)
            best = jnp.where(t_next < bounds_ref[...], best, best_next)
            state[...] = best

        best_ref[0, :, :] = jnp.broadcast_to(state[...], (bp, _LANE))

    return _backtrace_kernel


def viterbi_backtrace_pallas(hist, nframes, inter_frame_factor,
                             interpret=False):
    """The O(L)-per-frame backtrace as one reverse-streamed kernel.

    ``hist`` is the padded [F, bp, lp] forward history; returns the
    best lag per frame [F, bp] int32 (padded rows hold garbage).
    """
    maxframes, bp, lp = hist.shape
    bounds = nframes.astype(jnp.float32)[:, None]

    best = pl.pallas_call(
        _make_backtrace_kernel(
            maxframes, lp, float(inter_frame_factor)),
        grid=(maxframes,),
        in_specs=[
            pl.BlockSpec(
                (1, bp, lp),
                lambda f: (maxframes - 1 - f, 0, 0),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (bp, 1), lambda f: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bp, _LANE),
            lambda f: (maxframes - 1 - f, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (maxframes, bp, _LANE), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, 1), jnp.float32)],
        interpret=interpret,
    )(hist, bounds)
    return best[:, :, 0].astype(jnp.int32)


def viterbi_lags_pallas(local_cost, inter_frame_factor, nframes,
                        interpret=False):
    """Drop-in replacement for ops.pitch._viterbi_lags: Pallas
    forward min-plus kernel + Pallas reverse backtrace kernel (the
    backpointers are re-solved in O(L) per frame from the stored
    forward states, halving the forward work)."""
    bsz, maxframes, nlags = local_cost.shape
    idx = jnp.arange(nlags)
    penalty = (
        (idx[:, None] - idx[None, :]).astype(jnp.float32) ** 2
        * inter_frame_factor)

    hist = viterbi_forward_pallas(
        local_cost, penalty, nframes, interpret=interpret,
        keep_padding=True)
    best = viterbi_backtrace_pallas(
        hist, jnp.pad(nframes, (0, hist.shape[1] - bsz)),
        inter_frame_factor, interpret=interpret)
    return best.T[:bsz]
