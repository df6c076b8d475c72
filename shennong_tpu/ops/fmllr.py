"""fMLLR statistics and linear-VTLN transform estimation.

Replaces ``kaldi.transform.mllr.FmllrDiagGmmAccs`` and
``kaldi.transform.lvtln.LinearVtln`` (reference call sites
``shennong/processor/vtln.py:420-487``) with vectorized numpy/einsum
linear algebra: the per-frame accumulation loops become batched outer
products; the per-class objective evaluation solves the offset-only or
diagonal fMLLR problems in closed form.
"""

import numpy as np


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
        np.savez(
            path, transforms=self.transforms, warps=self.warps,
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
