"""Generic log-domain Viterbi decoding as a lax.scan.

Replaces the hmmlearn dependency of the reference
(``shennong/processor/pitch_crepe.py:233-243`` for pitch smoothing and
``:275-291`` for the voicing decision).
"""

import jax
import jax.numpy as jnp
import numpy as np


def viterbi_host(log_start, log_trans, log_obs):
    """Float64 host Viterbi, matching hmmlearn's decoder bit-for-bit.

    The CREPE decode paths replace the reference's hmmlearn calls with
    this routine: tie-breaking on emission-flat plateaus depends on the
    accumulator precision, so the host decode runs in float64 exactly
    like hmmlearn does (the jitted :func:`viterbi` below runs in
    float32 and may drift by one bin on exact ties).

    Same signature/return as :func:`viterbi`, numpy arrays.
    """
    log_trans = np.asarray(log_trans, dtype=np.float64)
    log_obs = np.asarray(log_obs, dtype=np.float64)
    nframes, nstates = log_obs.shape
    score = np.asarray(log_start, dtype=np.float64) + log_obs[0]
    backptr = np.zeros((nframes, nstates), dtype=np.int64)
    for t in range(1, nframes):
        total = score[:, None] + log_trans  # [from, to]
        backptr[t] = np.argmax(total, axis=0)
        score = total[backptr[t], np.arange(nstates)] + log_obs[t]
    path = np.zeros(nframes, dtype=np.int64)
    path[-1] = np.argmax(score)
    for t in range(nframes - 2, -1, -1):
        path[t] = backptr[t + 1][path[t + 1]]
    return path


def _band_matrix(log_trans, halfwidth):
    """[S, 2*halfwidth+1] band of ``log_trans``:
    band[j, d] = log_trans[j - halfwidth + d, j], -inf outside."""
    nstates = log_trans.shape[0]
    width = 2 * halfwidth + 1
    j = np.arange(nstates)
    src = j[:, None] - halfwidth + np.arange(width)[None, :]
    valid = (src >= 0) & (src < nstates)
    band = np.full((nstates, width), -np.inf)
    band[valid] = log_trans[
        src[valid], np.broadcast_to(j[:, None], src.shape)[valid]]
    return band


def viterbi_host_banded_obs(log_start, log_trans, observations,
                            uniform_weight, self_weight, halfwidth,
                            band=None):
    """:func:`viterbi_host_banded` for two-valued observation models.

    State j at frame t weighs ``self_weight`` when
    ``j == observations[t]`` and ``uniform_weight`` otherwise (the
    CREPE smoothing prior): the native kernel then never needs the
    dense [T, S] observation matrix (~1 GB per hour of audio). The
    numpy fallback materializes it.

    ``band`` optionally passes a precomputed
    ``_band_matrix(log_trans, halfwidth)`` — callers decoding many
    rows under one prior skip rebuilding it per row.
    """
    log_trans = np.asarray(log_trans, dtype=np.float64)
    nstates = log_trans.shape[0]
    observations = np.asarray(observations)
    if observations.shape[0] > 1:
        from shennong_tpu import native
        if band is None:
            band = _band_matrix(log_trans, halfwidth)
        path = native.viterbi_banded_two(
            np.asarray(log_start, dtype=np.float64), band,
            uniform_weight, self_weight, observations, nstates)
        if path is not None:
            return path
    log_obs = np.full(
        (observations.shape[0], nstates), uniform_weight)
    log_obs[np.arange(observations.shape[0]), observations] = \
        self_weight
    return viterbi_host_banded(
        log_start, log_trans, log_obs, halfwidth)


def viterbi_host_banded(log_start, log_trans, log_obs, halfwidth):
    """:func:`viterbi_host` for banded transition matrices.

    Bit-identical to the dense decoder when ``log_trans[i, j]`` is
    -inf for ``|i - j| > halfwidth`` (the in-band candidates are
    scanned in the same ascending source order, so argmax tie-breaks
    agree), at 1/S of the per-frame work — the CREPE pitch smoothing
    prior has halfwidth 11 over 360 states.
    """
    log_trans = np.asarray(log_trans, dtype=np.float64)
    log_obs = np.asarray(log_obs, dtype=np.float64)
    nframes, nstates = log_obs.shape
    band = _band_matrix(log_trans, halfwidth)

    if nframes > 1:
        # the native kernel performs the identical float64 operations
        from shennong_tpu import native
        path = native.viterbi_banded(log_start, band, log_obs)
        if path is not None:
            return path

    j = np.arange(nstates)
    score = np.asarray(log_start, dtype=np.float64) + log_obs[0]
    # int16: the band-relative pointer spans [0, 2 * halfwidth], and
    # int8 would silently wrap for halfwidth >= 64 (the native kernel
    # refuses such widths and lands here)
    backptr = np.zeros((nframes, nstates), dtype=np.int16)
    padded = np.full(nstates + 2 * halfwidth, -np.inf)
    window = np.lib.stride_tricks.as_strided(
        padded, shape=(nstates, 2 * halfwidth + 1),
        strides=(padded.itemsize, padded.itemsize))
    for t in range(1, nframes):
        padded[halfwidth:halfwidth + nstates] = score
        total = window + band  # [to, width]
        rel = np.argmax(total, axis=1)
        backptr[t] = rel
        score = total[j, rel] + log_obs[t]
    path = np.zeros(nframes, dtype=np.int64)
    path[-1] = np.argmax(score)
    for t in range(nframes - 2, -1, -1):
        path[t] = path[t + 1] - halfwidth + backptr[t + 1][path[t + 1]]
    return path


def viterbi_banded_obs_batch(log_start, band, uniform_weight,
                             self_weight, observations, nframes,
                             halfwidth):
    """Batched banded two-valued Viterbi ON DEVICE (float32).

    The jit-compatible twin of :func:`viterbi_host_banded_obs` for a
    whole slice of rows at once: ``observations`` [B, T] int32 holds
    each row's per-frame argmax bin, ``nframes`` [B] its real length.
    Rows decode exactly their first ``nframes`` frames — past a row's
    length the forward scores freeze and the stored back-pointers
    become identity, so the backtrace through the padded tail
    reproduces the prefix-only decode. Returns the [B, T] int32 state
    paths (arbitrary beyond each row's ``nframes``).

    Float32 forward scores may flip the decoded bin on near-ties
    where the float64 host decode distinguishes them (argmax
    tie-breaks themselves agree: first maximum, ascending source
    order). The CREPE processor exposes this as the opt-in
    ``decode='device'`` mode; the default stays on the bit-exact
    host kernel.
    """
    nstates = band.shape[0]
    width = 2 * halfwidth + 1
    band = jnp.asarray(band, jnp.float32)
    log_start = jnp.asarray(log_start, jnp.float32)
    uniform_weight = jnp.float32(uniform_weight)
    self_gain = jnp.float32(self_weight) - uniform_weight
    neg = jnp.float32(-3e38)
    # [S, W] gather indices into the hw-padded score row
    window_idx = (jnp.arange(nstates)[:, None]
                  + jnp.arange(width)[None, :])
    states = jnp.arange(nstates, dtype=jnp.int32)

    def emit(score, obs_t):
        # two-valued observation: uniform everywhere, self at obs_t
        return (score + uniform_weight
                + self_gain * (states[None, :] == obs_t[:, None]))

    score0 = emit(
        jnp.broadcast_to(log_start[None, :],
                         (observations.shape[0], nstates)),
        observations[:, 0])

    def forward(score, inputs):
        obs_t, active = inputs
        padded = jnp.pad(score, ((0, 0), (halfwidth, halfwidth)),
                         constant_values=neg)
        total = padded[:, window_idx] + band[None]  # [B, S, W]
        rel = jnp.argmax(total, axis=-1).astype(jnp.int8)
        best = jnp.max(total, axis=-1)
        new = emit(best, obs_t)
        # normalize so long sequences stay in float32 range (a
        # per-row constant shift changes no argmax)
        new = new - jnp.max(new, axis=-1, keepdims=True)
        keep = active[:, None]
        return (jnp.where(keep, new, score),
                jnp.where(keep, rel, jnp.int8(halfwidth)))

    steps = jnp.arange(1, observations.shape[1])
    final, backptrs = jax.lax.scan(
        forward, score0,
        (observations[:, 1:].T, (steps[:, None] < nframes[None, :])))

    last = jnp.argmax(final, axis=-1).astype(jnp.int32)

    def backward(state, bptr_t):
        # frozen frames stored identity (rel = halfwidth): the
        # backtrace walks through the padding unchanged
        prev = (state - halfwidth
                + jnp.take_along_axis(
                    bptr_t, state[:, None].astype(jnp.int32),
                    axis=1)[:, 0].astype(jnp.int32))
        return prev, prev

    _, states_rev = jax.lax.scan(backward, last, backptrs[::-1])
    return jnp.concatenate(
        [states_rev[::-1].T, last[:, None]], axis=1)


def viterbi(log_start, log_trans, log_obs):
    """Most likely state path of an HMM.

    Parameters
    ----------
    log_start : [S] log initial state probabilities
    log_trans : [S, S] log transition probabilities (from, to)
    log_obs : [T, S] per-frame log observation likelihoods

    Returns
    -------
    path : [T] int32 state indices
    """
    def forward(score, obs_t):
        total = score[:, None] + log_trans  # [from, to]
        backptr = jnp.argmax(total, axis=0).astype(jnp.int32)
        new_score = obs_t + jnp.max(total, axis=0)
        new_score = new_score - jnp.max(new_score)
        return new_score, backptr

    init = log_start + log_obs[0]
    init = init - jnp.max(init)
    final, backptrs = jax.lax.scan(forward, init, log_obs[1:])

    def backward(state, ptrs_t):
        prev = ptrs_t[state]
        return prev, prev

    last = jnp.argmax(final).astype(jnp.int32)
    _, states_rev = jax.lax.scan(backward, last, backptrs[::-1])
    return jnp.concatenate([states_rev[::-1], last[None]])
