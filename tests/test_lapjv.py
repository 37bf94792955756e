"""On-device Jonker-Volgenant assignment vs scipy (the HF/reference solver).

The reference's Hungarian matching happens on host inside HF's loss
(`D-Fine/temporal_dfine.py:195-233`); ours must be exact on device.
"""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax
import jax.numpy as jnp

from pautdx.ops.lapjv import lapjv, lapjv_batch


def _scipy_cost(c):
    r, col = linear_sum_assignment(c)
    return c[r, col].sum()


@pytest.mark.parametrize("m,q,seed", [
    (1, 4, 0), (2, 30, 1), (8, 30, 2), (8, 150, 3), (16, 300, 4),
    (30, 30, 5),
])
def test_lapjv_matches_scipy_objective(m, q, seed):
    rng = np.random.default_rng(seed)
    c = rng.normal(size=(m, q)).astype(np.float32) * 10
    ans = np.asarray(jax.jit(lapjv)(jnp.asarray(c)))
    assert len(set(ans.tolist())) == m, "columns must be distinct"
    ours = c[np.arange(m), ans].sum()
    ref = _scipy_cost(c)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-4)


def test_lapjv_many_random_instances():
    rng = np.random.default_rng(42)
    for _ in range(50):
        m = int(rng.integers(1, 12))
        q = int(rng.integers(m, 64))
        c = rng.normal(size=(m, q)).astype(np.float32) * 5
        ans = np.asarray(lapjv(jnp.asarray(c)))
        assert len(set(ans.tolist())) == m
        np.testing.assert_allclose(
            c[np.arange(m), ans].sum(), _scipy_cost(c), rtol=1e-5, atol=1e-4)


def test_lapjv_padded_columns_real_rows_optimal():
    """Uniform padded rows must not disturb the real rows' matching."""
    rng = np.random.default_rng(7)
    real, pad, q = 3, 5, 40
    c_real = rng.normal(size=(real, q)).astype(np.float32)
    c = np.concatenate([c_real, np.zeros((pad, q), np.float32)], 0)
    ans = np.asarray(lapjv(jnp.asarray(c)))
    assert len(set(ans.tolist())) == real + pad
    np.testing.assert_allclose(
        c_real[np.arange(real), ans[:real]].sum(),
        _scipy_cost(c_real), rtol=1e-5, atol=1e-4)


def test_lapjv_batch_vmap():
    rng = np.random.default_rng(3)
    c = rng.normal(size=(6, 5, 25)).astype(np.float32)
    ans = np.asarray(jax.jit(lapjv_batch)(jnp.asarray(c)))
    for b in range(6):
        np.testing.assert_allclose(
            c[b][np.arange(5), ans[b]].sum(), _scipy_cost(c[b]),
            rtol=1e-5, atol=1e-4)


def test_hungarian_match_no_host_callback():
    """The criterion's matcher must compile to pure HLO (no CustomCall
    host callbacks — those force SPMD full rematerialization on a mesh)."""
    from pautdx.losses.detr import hungarian_match

    cost = jnp.asarray(np.random.default_rng(0).normal(size=(4, 30, 6)),
                       jnp.float32)
    lowered = jax.jit(hungarian_match).lower(cost)
    hlo = lowered.compiler_ir(dialect="stablehlo")
    assert "callback" not in str(hlo), "matcher must not use host callbacks"
    out = np.asarray(jax.jit(hungarian_match)(cost))
    assert out.shape == (4, 6)
    # agree with scipy on the transposed problem
    for b in range(4):
        cb = np.asarray(cost[b]).T  # (M, Q)
        np.testing.assert_allclose(
            cb[np.arange(6), out[b]].sum(), _scipy_cost(cb),
            rtol=1e-5, atol=1e-4)
