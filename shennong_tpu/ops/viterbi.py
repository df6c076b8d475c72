"""Generic log-domain Viterbi decoding as a lax.scan.

Replaces the hmmlearn dependency of the reference
(``shennong/processor/pitch_crepe.py:233-243`` for pitch smoothing and
``:275-291`` for the voicing decision).
"""

import jax
import jax.numpy as jnp


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
