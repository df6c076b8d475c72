"""Batched diagonal-covariance GMM operations.

Replaces the ``kaldi.gmm`` C++ used by the reference UBM trainer
(``shennong/processor/ubm.py``: multithreaded EM accumulation,
gaussian selection, posteriors) with dense XLA linear algebra: GMM
log-likelihoods are one matmul pair on the MXU, EM statistics are
masked einsum reductions, gaussian selection is ``lax.top_k``. All
quantities stay associative so multi-device training reduces to psum
over per-shard statistics.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gconsts(weights, means, inv_vars):
    """Per-component log-normalizers of a diagonal GMM.

    gconst_g = log w_g - 0.5 (D log 2pi + sum_d (log var_gd +
    mean_gd^2 / var_gd)).
    """
    dim = means.shape[1]
    return (
        jnp.log(weights)
        - 0.5 * (dim * math.log(2 * math.pi)
                 - jnp.sum(jnp.log(inv_vars), axis=1)
                 + jnp.sum(means * means * inv_vars, axis=1)))


@jax.jit
def log_likelihoods(feats, weights, means, inv_vars):
    """Per-frame, per-component log-likelihoods: [N, D] -> [N, G]."""
    consts = gconsts(weights, means, inv_vars)
    linear = jnp.einsum(
        'nd,gd->ng', feats, means * inv_vars,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    quadratic = jnp.einsum(
        'nd,gd->ng', feats * feats, inv_vars,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    return consts[None, :] + linear - 0.5 * quadratic


@functools.partial(jax.jit, static_argnames=('num_gselect',))
def gaussian_selection(feats, weights, means, inv_vars, num_gselect):
    """Top-k component indices per frame, best first.

    Returns (loglike [N], indices [N, k]): the per-frame full-GMM
    log-likelihood (so callers can exclude padding rows from
    diagnostics) and the selected component indices.
    """
    loglikes = log_likelihoods(feats, weights, means, inv_vars)
    per_frame = jax.scipy.special.logsumexp(loglikes, axis=1)
    _, indices = jax.lax.top_k(loglikes, num_gselect)
    return per_frame, indices.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('num_gselect',))
def gaussian_selection_preselect(feats, preselect, weights, means,
                                 inv_vars, num_gselect):
    """Top-k restricted to each frame's preselected components.

    Kaldi gmm-gselect with --gselect (DiagGmm
    gaussian_selection_preselect, reference call site
    shennong/processor/ubm.py:474-480): the refined selection is the
    best ``num_gselect`` of the previous per-frame subset
    ``preselect`` [N, k_prev]. Returns (loglike [N] over the
    preselected components, indices [N, num_gselect] best first).
    """
    consts = gconsts(weights, means, inv_vars)
    sel_means = means[preselect]         # [N, k_prev, D]
    sel_inv = inv_vars[preselect]
    sel_consts = consts[preselect]
    linear = jnp.einsum(
        'nd,nkd->nk', feats, sel_means * sel_inv,
        precision=jax.lax.Precision.HIGHEST)
    quadratic = jnp.einsum(
        'nd,nkd->nk', feats * feats, sel_inv,
        precision=jax.lax.Precision.HIGHEST)
    loglikes = sel_consts + linear - 0.5 * quadratic
    per_frame = jax.scipy.special.logsumexp(loglikes, axis=1)
    _, pos = jax.lax.top_k(loglikes, num_gselect)
    indices = jnp.take_along_axis(preselect, pos, axis=1)
    return per_frame, indices.astype(jnp.int32)


@jax.jit
def posteriors_preselect(feats, indices, weights, means, inv_vars):
    """Posteriors restricted to preselected components.

    Returns (loglike_per_frame [N], posteriors [N, k]) where the
    posteriors are softmax-normalized over the selected components
    only (Kaldi gmm-global-gselect-to-post).
    """
    consts = gconsts(weights, means, inv_vars)
    sel_means = means[indices]           # [N, k, D]
    sel_inv = inv_vars[indices]
    sel_consts = consts[indices]
    linear = jnp.einsum(
        'nd,nkd->nk', feats, sel_means * sel_inv,
        precision=jax.lax.Precision.HIGHEST)
    quadratic = jnp.einsum(
        'nd,nkd->nk', feats * feats, sel_inv,
        precision=jax.lax.Precision.HIGHEST)
    loglikes = sel_consts + linear - 0.5 * quadratic
    norm = jax.scipy.special.logsumexp(loglikes, axis=1)
    return norm, jnp.exp(loglikes - norm[:, None])


@jax.jit
def accumulate_stats(feats, frame_weights, weights, means, inv_vars):
    """EM statistics of a feature matrix under the current model.

    Returns (tot_like, occupancy [G], mean_acc [G, D], var_acc [G, D])
    with per-frame ``frame_weights`` applied (Kaldi
    AccumDiagGmm::AccumulateFromDiag).
    """
    loglikes = log_likelihoods(feats, weights, means, inv_vars)
    norm = jax.scipy.special.logsumexp(loglikes, axis=1)
    gamma = jnp.exp(loglikes - norm[:, None]) * frame_weights[:, None]

    occupancy = jnp.sum(gamma, axis=0)
    mean_acc = jnp.einsum(
        'ng,nd->gd', gamma, feats,
        precision=jax.lax.Precision.HIGHEST)
    var_acc = jnp.einsum(
        'ng,nd->gd', gamma, feats * feats,
        precision=jax.lax.Precision.HIGHEST)
    tot_like = jnp.sum(norm * frame_weights)
    return tot_like, occupancy, mean_acc, var_acc


@functools.partial(
    jax.jit, static_argnames=(
        'min_gaussian_weight', 'min_gaussian_occupancy', 'min_variance',
        'axis_name'))
def em_step(feats, frame_weights, weights, means, inv_vars,
            min_gaussian_weight=1e-4, min_gaussian_occupancy=10.0,
            min_variance=0.001, axis_name=None):
    """One full EM iteration on device: accumulate + MLE update.

    The training loops keep the data and the model device-resident and
    dispatch one program per iteration instead of one accumulation per
    utterance plus a host-side update (the round-1 UBM trainer's
    bottleneck was exactly those per-utterance round trips). Floored
    components keep their previous mean/variance while their weight
    becomes max(occupancy share, min weight), like :func:`mle_update`
    and Kaldi MleDiagGmmUpdate (component removal, which changes
    shapes, stays host-side on the final iteration).

    Under ``shard_map`` pass ``axis_name`` to psum the statistics over
    that mesh axis before the update (the frame axis sharded across
    devices/hosts, the model replicated).

    Returns (tot_like, new_weights, new_means, new_inv_vars).
    """
    tot_like, occupancy, mean_acc, var_acc = accumulate_stats(
        feats, frame_weights, weights, means, inv_vars)
    if axis_name is not None:
        tot_like = jax.lax.psum(tot_like, axis_name)
        occupancy = jax.lax.psum(occupancy, axis_name)
        mean_acc = jax.lax.psum(mean_acc, axis_name)
        var_acc = jax.lax.psum(var_acc, axis_name)

    total = jnp.sum(occupancy)
    prob = jnp.where(
        total > 0, occupancy / jnp.maximum(total, 1e-10),
        1.0 / occupancy.shape[0])
    updatable = (
        (occupancy > min_gaussian_occupancy)
        & (prob > min_gaussian_weight))

    # Kaldi MleDiagGmmUpdate: a floored component keeps its mean and
    # variance but its WEIGHT still becomes max(prob, min_weight) —
    # there is no renormalization pass (renormalizing here would
    # drift every component's weight, gconst and likelihood away
    # from a Kaldi run on the same statistics). Exception: a
    # component with EXACTLY zero weight and zero occupancy is
    # padding (the init loop pads the model to its final size so the
    # split phase keeps one compiled shape; weight 0 makes it
    # numerically inert) — reviving it at min_weight would let it
    # accumulate mass. Kaldi never produces exact-zero weights, so
    # the carve-out is unreachable for real components.
    dead = (weights == 0) & (occupancy == 0)
    new_weights = jnp.where(
        updatable, prob, jnp.maximum(prob, min_gaussian_weight))
    new_weights = jnp.where(dead, 0.0, new_weights)
    safe_occ = jnp.maximum(occupancy, 1e-10)[:, None]
    new_means = jnp.where(
        updatable[:, None], mean_acc / safe_occ, means)
    variances = var_acc / safe_occ - (mean_acc / safe_occ) ** 2
    variances = jnp.maximum(variances, min_variance)
    new_inv = jnp.where(updatable[:, None], 1.0 / variances, inv_vars)
    return tot_like, new_weights, new_means, new_inv


@functools.partial(
    jax.jit, static_argnames=(
        'num_iters', 'min_gaussian_weight', 'min_gaussian_occupancy',
        'min_variance'))
def em_steps(feats, frame_weights, weights, means, inv_vars, num_iters,
             min_gaussian_weight=1e-4, min_gaussian_occupancy=10.0,
             min_variance=0.001):
    """``num_iters`` EM iterations fused into one device program.

    A ``lax.fori_loop`` over :func:`em_step`: the training loops pay
    one dispatch per *run* of same-shape iterations instead of one per
    iteration (each dispatch costs milliseconds through a device
    relay). Returns (tot_like of the last iteration, weights, means,
    inv_vars).
    """
    def body(_, carry):
        _, w, m, v = carry
        return em_step(
            feats, frame_weights, w, m, v,
            min_gaussian_weight=min_gaussian_weight,
            min_gaussian_occupancy=min_gaussian_occupancy,
            min_variance=min_variance)

    init = (jnp.float32(0.0), weights, means, inv_vars)
    return jax.lax.fori_loop(0, num_iters, body, init)


def mle_update(occupancy, mean_acc, var_acc, weights, means, inv_vars,
               min_gaussian_weight=1e-4, min_gaussian_occupancy=10.0,
               min_variance=0.001, remove_low_count_gaussians=False):
    """Maximum-likelihood update from accumulated statistics (numpy).

    Components whose occupancy falls under the floors keep their old
    parameters (or are dropped when ``remove_low_count_gaussians``).
    Matches Kaldi MleDiagGmmUpdate semantics.
    """
    occupancy = np.asarray(occupancy, dtype=np.float64)
    mean_acc = np.asarray(mean_acc, dtype=np.float64)
    var_acc = np.asarray(var_acc, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    means = np.asarray(means, dtype=np.float64)
    inv_vars = np.asarray(inv_vars, dtype=np.float64)

    total = occupancy.sum()
    prob = (occupancy / total if total > 0
            else np.full_like(occupancy, 1.0 / len(occupancy)))
    updatable = (
        (occupancy > min_gaussian_occupancy)
        & (prob > min_gaussian_weight))

    # Kaldi MleDiagGmmUpdate: a floored-but-kept component keeps its
    # mean/variance while its weight becomes max(prob, min_weight);
    # the vector is NOT renormalized (Kaldi only renormalizes when
    # components are removed, via RemoveComponents(renorm=true)).
    # Exact-zero-weight zero-occupancy components are padding (see
    # em_step) and stay dead.
    dead = (weights == 0) & (occupancy == 0)
    new_weights = np.where(
        updatable, prob, np.maximum(prob, min_gaussian_weight))
    new_weights = np.where(dead, 0.0, new_weights)
    safe_occ = np.maximum(occupancy, 1e-10)[:, None]
    new_means = np.where(
        updatable[:, None], mean_acc / safe_occ, means)
    variances = var_acc / safe_occ - new_means ** 2
    variances = np.maximum(variances, min_variance)
    new_inv = np.where(updatable[:, None], 1.0 / variances, inv_vars)

    if remove_low_count_gaussians and not updatable.all():
        keep = updatable.copy()
        if not keep.any():
            # Kaldi removes starved components in index order while
            # to_remove.size() < num_gauss-1, so when EVERY component
            # is starved the final-index one survives (with the
            # floored weight) — not the highest-occupancy one. A dead
            # padding component (exact-zero weight AND occupancy) must
            # not be the survivor: its weight is 0 and the renorm
            # below would divide by zero
            live = np.flatnonzero(~dead)
            if live.size == 0:
                raise ValueError(
                    'every GMM component is dead padding: nothing to keep')
            keep[live[-1]] = True
        new_weights = new_weights[keep]
        new_means = new_means[keep]
        new_inv = new_inv[keep]
        total_kept = new_weights.sum()
        assert total_kept > 0, 'kept components have zero total weight'
        new_weights = new_weights / total_kept

    return new_weights, new_means, new_inv


def split_gmm(weights, means, inv_vars, target, perturb_factor, rng):
    """Split the heaviest components until reaching ``target``.

    Kaldi DiagGmm::Split: each split halves the weight and perturbs
    the two means by +-perturb_factor * std * N(0, 1).
    """
    weights = list(np.asarray(weights, dtype=np.float64))
    means = list(np.asarray(means, dtype=np.float64))
    inv_vars = list(np.asarray(inv_vars, dtype=np.float64))

    while len(weights) < target:
        heaviest = int(np.argmax(weights))
        weights[heaviest] /= 2.0
        weights.append(weights[heaviest])
        std = 1.0 / np.sqrt(inv_vars[heaviest])
        noise = rng.randn(means[heaviest].shape[0]) * std * perturb_factor
        means.append(means[heaviest] + noise)
        means[heaviest] = means[heaviest] - noise
        inv_vars.append(inv_vars[heaviest].copy())

    return (np.asarray(weights), np.asarray(means),
            np.asarray(inv_vars))
