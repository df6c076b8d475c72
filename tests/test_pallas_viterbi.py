"""The Pallas Viterbi kernel must agree exactly with the XLA scan
implementation (run through the Pallas interpreter on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from shennong_tpu.ops.pitch import _viterbi_lags
from shennong_tpu.ops.pallas_viterbi import viterbi_lags_pallas


@pytest.mark.parametrize('shape,bounds', [
    ((5, 37, 50), [37, 30, 37, 5, 1]),
    ((1, 10, 417), [10]),
    ((8, 64, 130), [64] * 8),
    ((3, 100, 7), [100, 99, 50]),
])
def test_matches_xla(shape, bounds):
    rng = np.random.RandomState(0)
    local_cost = rng.rand(*shape).astype(np.float32)
    nframes = np.asarray(bounds, dtype=np.int32)
    factor = 2.5e-3

    ref = np.asarray(_viterbi_lags(
        jnp.asarray(local_cost), factor, jnp.asarray(nframes)))
    out = np.asarray(viterbi_lags_pallas(
        jnp.asarray(local_cost), factor, jnp.asarray(nframes),
        interpret=True))

    for row, bound in enumerate(bounds):
        assert np.array_equal(ref[row, :bound], out[row, :bound]), row


def test_structured_costs():
    """A cost landscape with a clear path: both implementations track
    the moving minimum."""
    B, F, L = 2, 60, 40
    local_cost = np.full((B, F, L), 5.0, dtype=np.float32)
    path = (np.linspace(5, 35, F)).astype(int)
    for f in range(F):
        local_cost[:, f, path[f]] = 0.0
    nframes = np.array([F, F], dtype=np.int32)

    out = np.asarray(viterbi_lags_pallas(
        jnp.asarray(local_cost), 1e-4, jnp.asarray(nframes),
        interpret=True))
    assert np.abs(out[0] - path).max() <= 1
    ref = np.asarray(_viterbi_lags(
        jnp.asarray(local_cost), 1e-4, jnp.asarray(nframes)))
    assert np.array_equal(ref, out)
