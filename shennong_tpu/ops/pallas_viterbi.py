"""Pallas TPU kernel for the pitch Viterbi forward recursion.

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
import numpy as np
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


@functools.partial(jax.jit, static_argnames=('interpret',))
def viterbi_forward_pallas(local_cost, penalty, nframes,
                           interpret=False):
    """Run the forward recursion, returning every forward state.

    Parameters
    ----------
    local_cost : [B, F, L] float32
    penalty : [L, L] float32 transition costs (symmetric)
    nframes : [B] int32 valid frame counts
    interpret : bool, static
        Run in the Pallas interpreter (for CPU testing).

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

    return hist[:, :bsz, :nlags]


def viterbi_lags_pallas(local_cost, inter_frame_factor, nframes,
                        interpret=False):
    """Drop-in replacement for ops.pitch._viterbi_lags backed by the
    Pallas forward kernel (backward backtrace stays in XLA, it is
    O(L) per frame)."""
    bsz, maxframes, nlags = local_cost.shape
    idx = jnp.arange(nlags)
    penalty = (
        (idx[:, None] - idx[None, :]).astype(jnp.float32) ** 2
        * inter_frame_factor)

    hist = viterbi_forward_pallas(
        local_cost, penalty, nframes, interpret=interpret)
    final_fwd = hist[maxframes - 1]
    fwd_hist = hist[:maxframes - 1]  # state after frames 0 .. F-2

    frame_ids = jnp.arange(maxframes)
    valid = (frame_ids[None, :] < nframes[:, None])

    last_best = jnp.argmin(final_fwd, axis=1).astype(jnp.int32)

    lag_ids = jnp.arange(nlags, dtype=jnp.float32)

    def backward_step(best_next, inputs):
        fwd_t, valid_next = inputs
        # quadratic penalty evaluated directly (no gather)
        diff = best_next.astype(jnp.float32)[:, None] - lag_ids[None, :]
        scores = fwd_t + diff * diff * inter_frame_factor
        best_here = jnp.argmin(scores, axis=1).astype(jnp.int32)
        best_here = jnp.where(valid_next, best_here, best_next)
        return best_here, best_here

    _, best_rev = jax.lax.scan(
        backward_step, last_best,
        (fwd_hist[::-1], valid[:, 1:].T[::-1]), unroll=4)
    return jnp.concatenate(
        [best_rev[::-1].T, last_best[:, None]], axis=1)
