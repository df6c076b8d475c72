"""Machine-ABX phone discriminability on extracted features.

The ABX task asks: given a segment X of phone p, a segment A of the
same phone and a segment B of another phone q, is X closer to A than
to B? The error rate over many triplets measures how well a feature
representation separates phone categories — the metric behind the
reference's headline quality tables (reference
``doc/source/intro_features.rst:99-160``, computed there with the
external ABXpy pipeline over DTW divergences).

This module evaluates the same quantity in-framework, TPU-first:

* frame-to-frame costs are one normalized matmul per segment-pair
  batch (MXU work),
* the DTW recurrence runs as a ``lax.scan`` over rows whose inner
  column dependence is reformulated as a parallel cumulative minimum
  (``associative_scan``) — O(rows) sequential steps instead of
  O(rows x cols),
* all segment pairs stream through one fixed-shape compiled program,
* the triplet aggregation (collapse over speaker pairs, then phone
  pairs) is cheap host numpy on the resulting distance matrix.

Divergences are normalized by the **realized path length** — the
number of cells on the optimal alignment path — exactly ABXpy's
normalizer (it lies between ``max(len)`` and ``len(x)+len(y)-1``).
When several paths share the minimum cost, the shortest one is used
(lexicographic ``(cost, length)`` minimization), which keeps the
normalizer well-defined and associative for the parallel scan.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ------------------------------------------------------------------- DTW

def _frame_costs(x, y, metric):
    """Pairwise frame costs [B, Ta, Tb] for segment batches."""
    if metric == 'cosine':
        xn = x / jnp.sqrt(
            jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
        yn = y / jnp.sqrt(
            jnp.sum(y * y, axis=-1, keepdims=True) + 1e-12)
        return 1.0 - jnp.einsum(
            'bif,bjf->bij', xn, yn,
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    if metric == 'euclidean':
        sq = (jnp.sum(x * x, axis=-1)[:, :, None]
              + jnp.sum(y * y, axis=-1)[:, None, :]
              - 2.0 * jnp.einsum(
                  'bif,bjf->bij', x, y,
                  precision=lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32))
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    raise ValueError(f'unknown metric: {metric}')


@functools.partial(jax.jit, static_argnames=('metric',))
def dtw_divergences(x, nx, y, ny, metric='cosine'):
    """Batched DTW divergence between padded segment pairs.

    Parameters
    ----------
    x : array [B, Ta, D]
        First segments, zero-padded along the frame axis.
    nx : int array [B]
        Valid frame counts of ``x`` (must be >= 1).
    y : array [B, Tb, D]
        Second segments, zero-padded.
    ny : int array [B]
        Valid frame counts of ``y`` (must be >= 1).
    metric : 'cosine' or 'euclidean'
        Frame-to-frame cost.

    Returns
    -------
    div : array [B]
        DTW path cost (steps right/down/diagonal) divided by the
        realized path length — the number of cells on the optimal
        alignment path, ABXpy's normalizer. Ties in cost resolve to
        the shortest path.

    Notes
    -----
    The row recurrence ``D[i,j] = c[i,j] + min(D[i-1,j], D[i-1,j-1],
    D[i,j-1])`` is sequential in ``j``; rewriting the paths entering
    row ``i`` at column ``k`` gives ``D[i,j] = S[j] + min_{k<=j}
    (m[k] - S[k-1])`` with ``S`` the running cost sum and ``m`` the
    entry cost — a cumulative minimum, computed in parallel across
    the row. The path length rides along as a second scan operand:
    a path entering at column ``k`` with entry length ``L[k]`` has
    length ``L[k] + 1 + (j - k)`` at ``(i, j)``, so carrying
    ``L[k] - k`` under lexicographic ``(cost, length)`` minimization
    keeps the cumulative scan associative. Padded rows/columns never
    reach the gathered endpoint ``(nx-1, ny-1)`` because DTW paths
    are monotonic.
    """
    costs = _frame_costs(
        x.astype(jnp.float32), y.astype(jnp.float32), metric)
    batch, rows, cols = costs.shape
    nx = nx.astype(jnp.int32)
    ny = ny.astype(jnp.int32)
    rng = jnp.arange(batch)
    end_col = ny - 1
    col_idx = jnp.arange(cols)

    def lexi_min(a, b):
        """(cost, length) pairs under lexicographic order."""
        cost_a, len_a = a
        cost_b, len_b = b
        take_a = (cost_a < cost_b) | (
            (cost_a == cost_b) & (len_a <= len_b))
        return (jnp.where(take_a, cost_a, cost_b),
                jnp.where(take_a, len_a, len_b))

    first = jnp.cumsum(costs[:, 0, :], axis=1)
    first_len = jnp.broadcast_to(
        (col_idx + 1).astype(jnp.float32), (batch, cols))
    end0 = jnp.where(nx == 1, first[rng, end_col], jnp.inf)
    end0_len = jnp.where(nx == 1, first_len[rng, end_col], 1.0)

    def step(carry, inputs):
        prev, prev_len, end, end_len = carry
        i, row_costs = inputs
        shifted = jnp.concatenate(
            [jnp.full((batch, 1), jnp.inf), prev[:, :-1]], axis=1)
        shifted_len = jnp.concatenate(
            [jnp.zeros((batch, 1)), prev_len[:, :-1]], axis=1)
        entry, entry_len = lexi_min(
            (prev, prev_len), (shifted, shifted_len))
        total = jnp.cumsum(row_costs, axis=1)
        before = jnp.concatenate(
            [jnp.zeros((batch, 1)), total[:, :-1]], axis=1)
        best_entry, best_len = lax.associative_scan(
            lexi_min, (entry - before, entry_len - col_idx), axis=1)
        current = total + best_entry
        current_len = best_len + 1.0 + col_idx
        end = jnp.where(i == nx - 1, current[rng, end_col], end)
        end_len = jnp.where(
            i == nx - 1, current_len[rng, end_col], end_len)
        return (current, current_len, end, end_len), None

    if rows > 1:
        (_, _, end, end_len), _ = lax.scan(
            step, (first, first_len, end0, end0_len),
            (jnp.arange(1, rows), jnp.moveaxis(costs[:, 1:, :], 1, 0)))
    else:
        end, end_len = end0, end0_len
    return end / end_len


# ----------------------------------------------------- distance matrices

@functools.partial(jax.jit, static_argnames=('metric',))
def _dtw_pairs(padded, lengths, left, right, metric):
    """DTW divergences of indexed segment pairs.

    The pair gather happens INSIDE the program: the segment store
    uploads to the device once and every batch ships only its [B]
    index vectors — indexing on the host would re-upload each
    segment once per pair it appears in (~N times), which through a
    host-device relay dominates the entire evaluation.
    """
    return dtw_divergences(
        jnp.take(padded, left, axis=0),
        jnp.take(lengths, left),
        jnp.take(padded, right, axis=0),
        jnp.take(lengths, right), metric=metric)


def pairwise_distances(segments, metric='cosine', batch=512):
    """Symmetric DTW divergence matrix over a list of segments.

    Parameters
    ----------
    segments : list of [T_i, D] arrays
        Feature segments (e.g. one per phone token). Every segment
        needs at least one frame.
    metric : 'cosine' or 'euclidean'
    batch : int
        Segment pairs per compiled device dispatch.

    Returns
    -------
    distances : [N, N] float numpy array, zero diagonal.
    """
    import concurrent.futures

    segments = [np.asarray(seg, dtype=np.float32) for seg in segments]
    if not segments:
        return np.zeros((0, 0))
    for index, seg in enumerate(segments):
        if seg.ndim != 2 or seg.shape[0] == 0:
            raise ValueError(
                f'segment {index} must be a non-empty [T, D] array')
    count = len(segments)
    dim = segments[0].shape[1]
    lengths = np.array([seg.shape[0] for seg in segments], np.int32)
    # one padded frame count -> one compiled program for every batch
    padded_len = max(8, int(-(-int(lengths.max()) // 8) * 8))
    padded = np.zeros((count, padded_len, dim), np.float32)
    for index, seg in enumerate(segments):
        padded[index, :seg.shape[0]] = seg

    # the segment store crosses the host-device link ONCE; batches
    # dispatch back to back and their [B]-sized results fetch on a
    # thread pool so the relay round trips overlap
    padded_dev = jnp.asarray(padded)
    lengths_dev = jnp.asarray(lengths)
    left, right = np.triu_indices(count, k=1)
    starts = list(range(0, len(left), batch))
    futures = []
    with concurrent.futures.ThreadPoolExecutor(4) as fetch_pool:
        for start in starts:
            li = left[start:start + batch]
            ri = right[start:start + batch]
            rows = len(li)
            if rows < batch:  # pad the final chunk: one compiled shape
                li = np.concatenate(
                    [li, np.zeros(batch - rows, np.int64)])
                ri = np.concatenate(
                    [ri, np.zeros(batch - rows, np.int64)])
            div = _dtw_pairs(
                padded_dev, lengths_dev, jnp.asarray(li),
                jnp.asarray(ri), metric)
            futures.append(fetch_pool.submit(np.asarray, div))
        distances = np.zeros((count, count), np.float64)
        for start, fut in zip(starts, futures):
            rows = len(left[start:start + batch])
            distances[left[start:start + batch],
                      right[start:start + batch]] = fut.result()[:rows]
    return distances + distances.T


def segments_from_alignment(features, alignment, tokens=None,
                            min_frames=1):
    """Cut a Features matrix into per-token segments.

    Parameters
    ----------
    features : Features
        Frame features with times (1-D centers or [nframes, 2]
        onset/offset pairs).
    alignment : Alignment
        Time-aligned tokens over the same recording.
    tokens : set, optional
        Keep only these tokens (default: all).
    min_frames : int
        Drop segments with fewer frames.

    Returns
    -------
    list of (token, data) with ``data`` the [T, D] segment.
    """
    times = np.asarray(features.times)
    centers = times.mean(axis=1) if times.ndim == 2 else times
    out = []
    for (onset, offset), token in zip(
            alignment.times, alignment.tokens):
        if tokens is not None and token not in tokens:
            continue
        mask = (centers >= onset) & (centers < offset)
        if mask.sum() >= min_frames:
            out.append((token, np.asarray(features.data)[mask]))
    return out


# ------------------------------------------------------------ ABX score

def _cell_score(d_ax, d_bx, exclude_diagonal=False):
    """Mean over (a, b, x) of [d(a,x) < d(b,x)] with 0.5 for ties.

    ``exclude_diagonal`` drops the a == x comparisons (within-speaker
    task, where X is drawn from the A set).
    """
    wins = (d_ax[:, None, :] < d_bx[None, :, :]).astype(np.float64)
    wins += 0.5 * (d_ax[:, None, :] == d_bx[None, :, :])
    if not exclude_diagonal:
        return wins.mean()
    n_a, n_b, n_x = wins.shape
    if n_a < 2:
        return None
    diag = np.eye(n_a, n_x, dtype=bool)
    total = wins.sum() - wins[diag[:, None, :] * np.ones(
        (1, n_b, 1), bool)].sum()
    return total / (n_b * n_a * (n_x - 1))


def abx_error(distances, phones, speakers, task='across'):
    """ABX discrimination error from a segment distance matrix.

    Parameters
    ----------
    distances : [N, N] array
        Pairwise segment divergences (:func:`pairwise_distances`).
    phones : length-N sequence
        Phone label of each segment.
    speakers : length-N sequence
        Speaker label of each segment.
    task : 'across' or 'within'
        'across': A and B share a speaker, X is the same phone as A
        from a different speaker. 'within': A, B and X all share one
        speaker (X a different token than A).

    Returns
    -------
    error : float
        Aggregated ABX error in [0, 1] (0.5 = chance). Cells
        collapse over speaker pairs, then over ordered phone pairs —
        the ABXpy aggregation scheme.

    Raises
    ------
    ValueError if no valid (phone pair, speaker) cell exists.
    """
    if task not in ('across', 'within'):
        raise ValueError(f'unknown task: {task}')
    distances = np.asarray(distances)
    phones = np.asarray(phones)
    speakers = np.asarray(speakers)
    phone_set = sorted(set(phones.tolist()))
    speaker_set = sorted(set(speakers.tolist()))
    by_cell = {
        (phone, speaker): np.flatnonzero(
            (phones == phone) & (speakers == speaker))
        for phone in phone_set for speaker in speaker_set}

    pair_scores = []
    for p in phone_set:
        for q in phone_set:
            if p == q:
                continue
            cells = []
            for s1 in speaker_set:
                a_idx = by_cell[(p, s1)]
                b_idx = by_cell[(q, s1)]
                if not len(a_idx) or not len(b_idx):
                    continue
                if task == 'across':
                    for s2 in speaker_set:
                        if s2 == s1:
                            continue
                        x_idx = by_cell[(p, s2)]
                        if not len(x_idx):
                            continue
                        cells.append(_cell_score(
                            distances[np.ix_(a_idx, x_idx)],
                            distances[np.ix_(b_idx, x_idx)]))
                elif task == 'within':
                    score = _cell_score(
                        distances[np.ix_(a_idx, a_idx)],
                        distances[np.ix_(b_idx, a_idx)],
                        exclude_diagonal=True)
                    if score is not None:
                        cells.append(score)
                else:
                    raise ValueError(f'unknown task: {task}')
            if cells:
                pair_scores.append(float(np.mean(cells)))
    if not pair_scores:
        raise ValueError(
            'no valid ABX cell: need at least two phones and, for '
            'the across task, the same phone from two speakers')
    return 1.0 - float(np.mean(pair_scores))
