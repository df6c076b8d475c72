"""fMLLR statistics and linear-VTLN transform estimation.

Replaces ``kaldi.transform.mllr.FmllrDiagGmmAccs`` and
``kaldi.transform.lvtln.LinearVtln`` (reference call sites
``shennong/processor/vtln.py:420-487``) with vectorized numpy/einsum
linear algebra: the per-frame accumulation loops become batched outer
products; the per-class objective evaluation solves the offset-only or
diagonal fMLLR problems in closed form.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(
    jax.jit,
    static_argnames=('opts', 'nframes_max', 'delta_order',
                     'delta_window'))
def warp_class_mapping_moments(signals, nsamples, nframes, mel_weights,
                               weights, opts, nframes_max,
                               delta_order=None, delta_window=None,
                               key=None):
    """Weighted first/second moments of every warp class, fused.

    One program computes the warped MFCC(+delta) features of a signal
    batch for all C classes plus the unwarped reference (framing and
    DFT shared, ``mel_weights[C]`` must be the unwarped bank), then
    reduces them against the frame-selection ``weights`` [B, T] (VAD
    and subsampling mask) — the features themselves never reach the
    host (the round-1 path fetched [C, B, T, D] feature tensors and
    re-uploaded them for deltas).

    The second moments are *centered at the batch means* so the
    float32 accumulation stays well conditioned (raw normal equations
    lose ~1e-2 of the transform to cancellation);
    :func:`solve_mapping_from_moments` merges batches exactly in
    float64.

    Returns (beta, mu_x [D], mu_y [C, D], Cxx [D, D], Cyx [C, D, D]).
    """
    from shennong_tpu.ops import postops, spectral

    feats = spectral.mfcc_multi_warp_batch(
        signals, nsamples, mel_weights, opts, nframes_max, key=key)
    nclasses1, bsz, maxframes, dim = feats.shape

    if delta_order is not None:
        flat = feats.reshape(nclasses1 * bsz, maxframes, dim)
        tiled = jnp.tile(nframes, nclasses1)
        flat = postops.compute_deltas(
            flat, tiled, order=delta_order, window=delta_window)
        feats = flat.reshape(nclasses1, bsz, maxframes, -1)

    x = feats[-1]        # [B, T, D] unwarped
    y = feats[:-1]       # [C, B, T, D] warped

    kwargs = dict(
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    beta = jnp.sum(weights)
    # a batch whose selection weights are all zero (e.g. a tail batch
    # fully rejected by VAD) must contribute zero moments, not NaN —
    # 0 * NaN would poison the float64 merge for every batch
    safe_beta = jnp.maximum(beta, 1e-30)
    mu_x = jnp.einsum('bt,btd->d', weights, x, **kwargs) / safe_beta
    mu_y = jnp.einsum('bt,cbtd->cd', weights, y, **kwargs) / safe_beta

    xc = x - mu_x
    yc = y - mu_y[:, None, None, :]
    wxc = xc * weights[:, :, None]
    Cxx = jnp.einsum('btd,bte->de', wxc, xc, **kwargs)
    Cyx = jnp.einsum('cbtd,bte->cde', yc, wxc, **kwargs)
    return beta, mu_x, mu_y, Cxx, Cyx


def merge_moments(moments):
    """Merge per-batch centered moments into one equivalent tuple.

    ``moments`` is a list of the tuples returned by
    :func:`warp_class_mapping_moments` (numpy, any dtype — merged in
    float64 with the standard parallel-covariance corrections).
    Returns a single (beta, mu_x, mu_y, Cxx, Cyx) float64 tuple — the
    merge is associative, so multi-host training can merge each
    host's batches locally, allgather the per-host tuples and merge
    those identically everywhere.
    """
    moments = [
        tuple(np.asarray(m, dtype=np.float64) for m in batch)
        for batch in moments]
    beta = sum(m[0] for m in moments)
    if not beta > 0:
        raise ValueError(
            'no selected frames in any batch, cannot estimate the '
            'warp-class transforms')
    mu_x = sum(m[0] * m[1] for m in moments) / beta
    mu_y = sum(m[0] * m[2] for m in moments) / beta

    nclasses, dim = moments[0][2].shape
    Cxx = np.zeros((dim, dim))
    Cyx = np.zeros((nclasses, dim, dim))
    for beta_b, mu_x_b, mu_y_b, Cxx_b, Cyx_b in moments:
        dx = mu_x_b - mu_x
        Cxx += Cxx_b + beta_b * np.outer(dx, dx)
        Cyx += Cyx_b + beta_b * np.einsum(
            'cd,e->cde', mu_y_b - mu_y, dx)
    return beta, mu_x, mu_y, Cxx, Cyx


def solve_mapping_from_moments(moments):
    """Merge per-batch centered moments and solve every warp class.

    ``moments`` is a list of :func:`warp_class_mapping_moments`
    tuples (see :func:`merge_moments`). Returns the [C, D, D]
    transforms with the same per-dimension variance normalization as
    :func:`compute_mapping_transform` (the centered reformulation
    yields the identical least-squares solution).
    """
    beta, mu_x, mu_y, Cxx, Cyx = merge_moments(moments)
    nclasses, dim = mu_y.shape

    Cxx_inv = np.linalg.inv(Cxx)
    transforms = np.zeros((nclasses, dim, dim))
    x_var = np.diag(Cxx) / beta
    for c in range(nclasses):
        A = Cyx[c] @ Cxx_inv
        y_var = np.einsum('de,ef,df->d', A, Cxx, A) / beta
        transforms[c] = A * np.sqrt(x_var / y_var)[:, None]
    return transforms


@functools.partial(jax.jit, static_argnames=('num_groups',))
def fmllr_stats_groups(feats, post_idx, post_val, groups, means,
                       inv_vars, num_groups):
    """fMLLR statistics of many speakers in one device program.

    ``feats`` [N, D] are concatenated frames, ``post_idx``/``post_val``
    [N, k] the preselected posteriors, ``groups`` [N] the speaker index
    per frame. The per-frame accumulation loops of Kaldi
    ``FmllrDiagGmmAccs`` become three einsums with a group one-hot;
    the [S]-indexed outputs are associative (psum-able across devices).

    Returns (beta [S], K [S, D, D+1], G [S, D, D+1, D+1]). Callers
    chunk the frame axis (the xplus Gram intermediate is
    N x (D+1)^2) and sum chunks in float64.
    """
    n, dim = feats.shape
    xplus = jnp.concatenate(
        [feats, jnp.ones((n, 1), feats.dtype)], axis=1)
    sel_means = means[post_idx]          # [N, k, D]
    sel_inv = inv_vars[post_idx]
    kwargs = dict(
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    weighted_mean = jnp.einsum(
        'nk,nkd->nd', post_val, sel_means * sel_inv, **kwargs)
    weighted_inv = jnp.einsum('nk,nkd->nd', post_val, sel_inv, **kwargs)

    onehot = jax.nn.one_hot(groups, num_groups, dtype=feats.dtype)
    beta = jnp.einsum('ns,nk->s', onehot, post_val, **kwargs)
    K = jnp.einsum('ns,nd,ne->sde', onehot, weighted_mean, xplus,
                   **kwargs)
    xx = jnp.einsum('ne,nf->nef', xplus, xplus).reshape(n, -1)
    G = jnp.einsum(
        'nq,ng->qg',
        (onehot[:, :, None] * weighted_inv[:, None, :]).reshape(n, -1),
        xx, **kwargs).reshape(num_groups, dim, dim + 1, dim + 1)
    return beta, K, G


class FmllrStats:
    """fMLLR sufficient statistics for a diagonal GMM.

    beta (scalar), K [D, D+1] and G [D, D+1, D+1] such that the fMLLR
    auxiliary function of an affine transform W is
    sum_d (w_d . k_d - 0.5 w_d G_d w_d^T) + beta log|det A|.
    """

    def __init__(self, dim):
        self.dim = dim
        self.beta = 0.0
        self.K = np.zeros((dim, dim + 1))
        self.G = np.zeros((dim, dim + 1, dim + 1))

    def accumulate(self, feats, post_indices, post_values, gmm):
        """Accumulate from frames and preselected posteriors.

        feats [N, D]; post_indices/post_values [N, k] give the
        selected GMM components and their posteriors per frame.
        """
        feats = np.asarray(feats, dtype=np.float64)
        nframes = feats.shape[0]
        xplus = np.concatenate(
            [feats, np.ones((nframes, 1))], axis=1)  # [N, D+1]

        inv_vars = gmm.inv_vars[post_indices]       # [N, k, D]
        means = gmm.means[post_indices]             # [N, k, D]
        post = np.asarray(post_values, dtype=np.float64)

        self.beta += post.sum()
        # K += sum_{n,k} p * (invvar * mean) outer xplus
        weighted_mean = np.einsum(
            'nk,nkd->nd', post, inv_vars * means)  # [N, D]
        self.K += weighted_mean.T @ xplus
        # G_d += sum_n (sum_k p * invvar_d) xplus xplus^T
        weighted_inv = np.einsum('nk,nkd->nd', post, inv_vars)  # [N, D]
        xx = np.einsum('ne,nf->nef', xplus, xplus).reshape(
            nframes, -1)  # [N, (D+1)^2]
        self.G += (weighted_inv.T @ xx).reshape(
            self.dim, self.dim + 1, self.dim + 1)

    def copy(self):
        out = FmllrStats(self.dim)
        out.beta = self.beta
        out.K = self.K.copy()
        out.G = self.G.copy()
        return out


def apply_transform_to_stats(matrix, stats):
    """Transform fMLLR stats as if features went through x -> A x.

    ``matrix`` is the [D, D] square transform; equivalent to Kaldi's
    ApplyFeatureTransformToStats with an affine [A | 0].
    """
    dim = stats.dim
    aplus = np.eye(dim + 1)
    aplus[:dim, :dim] = matrix

    out = FmllrStats(dim)
    out.beta = stats.beta
    out.K = stats.K @ aplus.T
    # batched A+ G_d A+^T (a 3-operand einsum here would contract the
    # naive 5-index loop and dominate the whole VTLN training)
    out.G = aplus @ stats.G @ aplus.T
    return out


def auxf(transform, stats):
    """fMLLR auxiliary function of an affine transform [D, D+1]."""
    dim = stats.dim
    square = transform[:, :dim]
    sign, logdet = np.linalg.slogdet(square)
    if sign <= 0:
        return -np.inf
    quad = sum(
        transform[d] @ stats.K[d]
        - 0.5 * transform[d] @ stats.G[d] @ transform[d]
        for d in range(dim))
    return stats.beta * logdet + quad


def solve_offset(stats):
    """Best offset-only secondary transform: W = [I | b].

    Maximizing per dimension: b_d = (k_d[D] - G_d[D, d]) / G_d[D, D].
    """
    dim = stats.dim
    transform = np.concatenate(
        [np.eye(dim), np.zeros((dim, 1))], axis=1)
    for d in range(dim):
        gdd = stats.G[d][dim, dim]
        if gdd > 0:
            transform[d, dim] = (
                stats.K[d][dim] - stats.G[d][dim, d]) / gdd
    return transform


def solve_diagonal(stats):
    """Best diagonal secondary transform: W = [diag(a) | b].

    Per dimension the objective beta log|a| + a q - a^2 p / 2 (+ the
    offset part solved jointly) has the closed-form positive root
    a = (q + sqrt(q^2 + 4 p beta)) / (2 p).
    """
    dim = stats.dim
    transform = np.zeros((dim, dim + 1))
    for d in range(dim):
        k1 = stats.K[d][d]
        k2 = stats.K[d][dim]
        g11 = stats.G[d][d, d]
        g12 = stats.G[d][d, dim]
        g22 = stats.G[d][dim, dim]
        p = g11 - g12 * g12 / g22
        q = k1 - g12 * k2 / g22
        a = (q + np.sqrt(q * q + 4 * p * stats.beta)) / (2 * p)
        b = (k2 - a * g12) / g22
        transform[d, d] = a
        transform[d, dim] = b
    return transform


class LinearVtln:
    """Container of per-warp-class linear transforms (Kaldi
    LinearVtln)."""

    def __init__(self, dim, num_classes, default_class):
        self.dim = dim
        self.num_classes = num_classes
        self.default_class = default_class
        # each class starts at identity
        self.transforms = np.tile(np.eye(dim), (num_classes, 1, 1))
        self.warps = np.ones(num_classes)

    def set_transform(self, class_idx, matrix):
        self.transforms[class_idx] = np.asarray(matrix)

    def set_warp(self, class_idx, warp):
        self.warps[class_idx] = float(warp)

    def get_warp(self, class_idx):
        return float(self.warps[class_idx])

    def compute_transform(self, stats, norm_type='offset',
                          logdet_scale=0.0):
        """Pick the warp class and secondary transform maximizing the
        fMLLR objective.

        Returns (class_idx, logdet, transform [D, D+1], objf_impr,
        count): the improvement is measured against the default class
        with the corresponding secondary estimation, like Kaldi
        gmm-global-est-lvtln-trans.
        """
        if norm_type not in ('none', 'offset', 'diag'):
            raise ValueError(f'Invalid norm type {norm_type}')
        if stats.beta == 0:
            raise ValueError('no stats accumulated')

        dim = self.dim
        best = None
        objf_per_class = np.zeros(self.num_classes)
        transforms = []
        for c in range(self.num_classes):
            transformed = apply_transform_to_stats(
                self.transforms[c], stats)
            if norm_type == 'none':
                secondary = np.concatenate(
                    [np.eye(dim), np.zeros((dim, 1))], axis=1)
            elif norm_type == 'offset':
                secondary = solve_offset(transformed)
            else:
                secondary = solve_diagonal(transformed)

            objf = auxf(secondary, transformed)
            sign, logdet = np.linalg.slogdet(self.transforms[c])
            objf += logdet_scale * stats.beta * logdet
            objf_per_class[c] = objf

            # compose: x -> secondary(A_c x)
            combined = np.concatenate([
                secondary[:, :dim] @ self.transforms[c],
                secondary[:, dim:]], axis=1)
            transforms.append(combined)

        best = int(np.argmax(objf_per_class))
        objf_impr = (
            objf_per_class[best] - objf_per_class[self.default_class])
        sign, logdet = np.linalg.slogdet(self.transforms[best])
        return (best, logdet, transforms[best], objf_impr, stats.beta)

    def save(self, path):
        """Save the transforms and warps to an npz checkpoint"""
        # through an open file object: np.savez(path) silently
        # appends '.npz' to other extensions, breaking the round-trip
        with open(path, 'wb') as fp:
            np.savez(
                fp, transforms=self.transforms, warps=self.warps,
                default_class=self.default_class)

    @classmethod
    def load(cls, path):
        with np.load(path) as data:
            transforms = data['transforms']
            out = cls(
                transforms.shape[1], transforms.shape[0],
                int(data['default_class']))
            out.transforms = transforms
            out.warps = data['warps']
        return out


def compute_mapping_transform(feats_pairs, dim, weights=None):
    """Least-squares linear map from unwarped to warped features.

    ``feats_pairs`` iterates over (x [N, D], y [N, D], w [N] or None)
    triplets; returns the [D, D] matrix minimizing ||y - A x+||^2 with
    per-dimension variance normalization (Kaldi
    gmm-train-lvtln-special).
    """
    Q = np.zeros((dim + 1, dim + 1))
    L = np.zeros((dim, dim + 1))
    beta = 0.0
    sum_xplus = np.zeros(dim + 1)
    sumsq_x = np.zeros(dim)

    for x, y, w in feats_pairs:
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        n = x.shape[0]
        w = np.ones(n) if w is None else np.asarray(w, dtype=np.float64)
        xplus = np.concatenate([x, np.ones((n, 1))], axis=1)

        Q += (xplus * w[:, None]).T @ xplus
        L += (y * w[:, None]).T @ xplus
        beta += w.sum()
        sum_xplus += w @ xplus
        sumsq_x += w @ (x * x)

    Qinv = np.linalg.inv(Q)
    A = np.zeros((dim, dim))
    for d in range(dim):
        w_d = Qinv @ L[d]
        # per-dimension variance normalization
        x_var = sumsq_x[d] / beta - (sum_xplus[d] / beta) ** 2
        y_var = (w_d @ Q @ w_d) / beta - ((w_d @ sum_xplus) / beta) ** 2
        scale = np.sqrt(x_var / y_var)
        A[d] = w_d[:dim] * scale
    return A


def solve_warp_classes(beta, K, G, base, warps, valid_base,
                       logdet_base, norm_type='offset',
                       logdet_scale=0.0, default_class=0):
    """Per-(group, warp-class) objective maximization from fMLLR stats.

    The on-device twin of Kaldi ``LinearVtln::ComputeTransform``
    vectorized over every group at once: transform the statistics
    through each class's base matrix, solve the secondary offset/diag
    problem in closed form and pick the class maximizing the fMLLR
    auxiliary function. Only five entries of the congruence-transformed
    stats are needed per (group, class, dim):

    - ``K'[d, d]    = K[s, d, :D] . A_c[d]``
    - ``K'[d, D]    = K[s, d, D]``
    - ``G'[d, d, d] = A_c[d] G[s, d, :D, :D] A_c[d]``
    - ``G'[d, d, D] = A_c[d] G[s, d, :D, D]``
    - ``G'[d, D, D] = G[s, d, D, D]``

    ``beta`` [S], ``K`` [S, D, D+1] and ``G`` [S, D, D+1, D+1] are the
    (possibly psum'd across a device mesh) statistics of
    :func:`fmllr_stats_groups`; ``base`` [C, D, D] the warp-class base
    transforms with ``valid_base`` [C] / ``logdet_base`` [C] their
    precomputed determinant signs and log-determinants.

    Returns (transforms [S, D, D+1], warps_out [S], best_class [S],
    objf_impr [S], beta [S]).
    """
    num_groups, dim = K.shape[0], K.shape[1]
    kwargs = dict(
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    Kdd = jnp.einsum('sde,cde->scd', K[..., :dim], base, **kwargs)
    KdD = K[:, :, dim][:, None, :]
    Gddd = jnp.einsum(
        'cde,sdef,cdf->scd', base, G[:, :, :dim, :dim], base,
        **kwargs)
    GddD = jnp.einsum(
        'cde,sde->scd', base, G[:, :, :dim, dim], **kwargs)
    GdDD = G[:, :, dim, dim][:, None, :]

    safe_g = jnp.where(GdDD > 0, GdDD, 1.0)
    if norm_type == 'offset':
        a = jnp.ones_like(Kdd)
        b = jnp.where(GdDD > 0, (KdD - GddD) / safe_g, 0.0)
        sec_logdet = jnp.zeros(
            (num_groups, base.shape[0]), K.dtype)
    elif norm_type == 'none':
        a = jnp.ones_like(Kdd)
        b = jnp.zeros_like(Kdd)
        sec_logdet = jnp.zeros(
            (num_groups, base.shape[0]), K.dtype)
    else:  # diag
        p = Gddd - GddD * GddD / safe_g
        q = Kdd - GddD * KdD / safe_g
        safe_p = jnp.where(p > 0, p, 1.0)
        a = (q + jnp.sqrt(
            q * q + 4.0 * safe_p * beta[:, None, None])) \
            / (2.0 * safe_p)
        b = (KdD - a * GddD) / safe_g
        sec_logdet = jnp.sum(
            jnp.log(jnp.maximum(a, 1e-20)), axis=-1)

    quadterm = (a * Kdd + b * KdD
                - 0.5 * (a * a * Gddd + 2.0 * a * b * GddD
                         + b * b * GdDD))
    objf = jnp.sum(quadterm, axis=-1)
    objf = objf + beta[:, None] * sec_logdet
    objf = objf + (
        logdet_scale * beta[:, None] * logdet_base[None, :])
    objf = jnp.where(valid_base[None, :], objf, -jnp.inf)

    best = jnp.argmax(objf, axis=1)
    rows = jnp.arange(num_groups)
    impr = objf[rows, best] - objf[:, default_class]
    a_best = a[rows, best]                       # [S, D]
    b_best = b[rows, best]                       # [S, D]
    linear = a_best[:, :, None] * base[best]     # [S, D, D]
    transforms = jnp.concatenate(
        [linear, b_best[..., None]], axis=2)
    return transforms, warps[best], best, impr, beta


@functools.partial(
    jax.jit,
    static_argnames=(
        'num_groups', 'num_iters', 'norm_type', 'default_class',
        'min_gaussian_weight', 'axis_name'))
def lvtln_rounds(feats, fweights, gid, gsel, base, warps,
                 gmm_weights, gmm_means, gmm_inv_vars,
                 num_groups, num_iters, norm_type='offset',
                 logdet_scale=0.0, default_class=0,
                 min_gaussian_weight=1e-4, axis_name=None):
    """The whole LVTLN estimation loop as ONE device program.

    Fuses the reference's per-iteration sequence (apply transforms ->
    re-estimate UBM -> posteriors -> per-speaker fMLLR stats ->
    per-class objective maximization,
    ``shennong/processor/vtln.py:643-664``) into a ``lax.fori_loop``:
    the features, the gaussian selection, the GMM and the transforms
    stay device-resident across all ``num_iters`` rounds, and the per
    -(speaker, class) objective evaluation contracts to a handful of
    einsums (the offset/diag secondary solves only need five scalar
    entries of the transformed stats per (s, c, d), never the full
    congruence-transformed G).

    Parameters: ``feats`` [N, D] concatenated *original* frames
    (padded; ``fweights`` [N] zero on padding), ``gid`` [N] speaker
    index per frame, ``gsel`` [N, k] fixed gaussian-selection indices,
    ``base`` [C, D, D] warp-class base transforms, ``warps`` [C].

    Under ``shard_map`` pass ``axis_name`` to train across a device
    mesh: the frame axis (feats/fweights/gid/gsel) shards over that
    axis, everything else replicates, and the fMLLR statistics and EM
    accumulators psum per round — every device steps the identical
    model and transforms (the multi-host twin of the reference's
    SLURM VTLN fan-out, ``examples/vtln_training/run.sh:16-23``).

    Returns (weights, means, inv_vars, transforms [S, D, D+1],
    warps_out [S], best_class [S], objf_impr [S], beta [S]): the
    updated GMM and, per speaker group, the selected combined
    transform, its warp, the class index, the objective improvement
    over the default class and the stat mass.
    """
    from shennong_tpu.ops import gmm as gmm_ops

    n, dim = feats.shape
    kwargs = dict(
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)

    onehot = jax.nn.one_hot(gid, num_groups, dtype=feats.dtype)
    xplus = jnp.concatenate(
        [feats, jnp.ones((n, 1), feats.dtype)], axis=1)
    xx = jnp.einsum('ne,nf->nef', xplus, xplus).reshape(n, -1)

    sign_b, logdet_base = jnp.linalg.slogdet(base)
    # a non-positive-determinant base transform is degenerate; mark
    # it with a finite zero logdet and exclude the class in the
    # objective itself (an -inf here would propagate as 0 * -inf =
    # NaN through the default logdet_scale=0 and corrupt the argmax)
    valid_base = sign_b > 0
    logdet_base = jnp.where(valid_base, logdet_base, 0.0)

    def estimate_transforms(params, x_for_post):
        w_, m_, iv_ = params
        # posteriors over the preselected components, computed on the
        # *transformed* features with the current model (Kaldi
        # gmm-global-gselect-to-post)
        consts = gmm_ops.gconsts(w_, m_, iv_)
        sel_m = m_[gsel]
        sel_iv = iv_[gsel]
        lin = jnp.einsum('nd,nkd->nk', x_for_post, sel_m * sel_iv,
                         **kwargs)
        quad = jnp.einsum(
            'nd,nkd->nk', x_for_post * x_for_post, sel_iv, **kwargs)
        loglikes = consts[gsel] + lin - 0.5 * quad
        post = jax.nn.softmax(loglikes, axis=1) * fweights[:, None]

        # fMLLR stats against the ORIGINAL features
        wm = jnp.einsum('nk,nkd->nd', post, sel_iv * sel_m, **kwargs)
        wi = jnp.einsum('nk,nkd->nd', post, sel_iv, **kwargs)
        beta = jnp.einsum('ns,nk->s', onehot, post, **kwargs)
        K = jnp.einsum('ns,nd,ne->sde', onehot, wm, xplus, **kwargs)
        G = jnp.einsum(
            'nq,ng->qg',
            (onehot[:, :, None] * wi[:, None, :]).reshape(n, -1),
            xx, **kwargs).reshape(num_groups, dim, dim + 1, dim + 1)
        if axis_name is not None:
            beta = jax.lax.psum(beta, axis_name)
            K = jax.lax.psum(K, axis_name)
            G = jax.lax.psum(G, axis_name)

        # per-(speaker, class) objective: transform the stats through
        # aplus_c = [[A_c, 0], [0, 1]] and solve the secondary
        # offset/diag problem in closed form
        return solve_warp_classes(
            beta, K, G, base, warps, valid_base, logdet_base,
            norm_type=norm_type, logdet_scale=logdet_scale,
            default_class=default_class)

    def apply_transforms(transforms):
        z = jnp.einsum(
            'nd,sed->nse', feats, transforms[:, :, :dim], **kwargs)
        z = z + transforms[:, :, dim][None]
        return jnp.einsum('ns,nse->ne', onehot, z, **kwargs)

    init_gmm = (gmm_weights, gmm_means, gmm_inv_vars)
    init_est = estimate_transforms(init_gmm, feats)

    def body(_, carry):
        w_, m_, iv_, transforms, *_rest = carry
        x = apply_transforms(transforms)
        _, w2, m2, iv2 = gmm_ops.em_step(
            x, fweights, w_, m_, iv_,
            min_gaussian_weight=min_gaussian_weight,
            axis_name=axis_name)
        est = estimate_transforms((w2, m2, iv2), x)
        return (w2, m2, iv2) + est

    carry = init_gmm + init_est
    return jax.lax.fori_loop(0, num_iters, body, carry)
