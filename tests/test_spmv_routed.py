"""Routed SpMV (kernels/spmv_routed): SciPy parity in interpret mode,
edge-coloring validity, determinism, and plan edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.ops.kernels.spmv_routed import (spmv_routed,
                                              spmv_routed_plan)


def _scipy(a):
    from scipy import sparse as sp

    return sp.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                          np.asarray(a.indptr)), shape=a.shape)


def _plan(a):
    m, n = a.shape
    return spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), m, n)


@pytest.mark.parametrize("m,n,dens,seed", [
    (300, 256, 0.05, 0),
    (1000, 1000, 0.01, 1),
    (130, 1000, 0.002, 2),
    (64, 64, 0.3, 4),
    (129, 200, 0.08, 5),      # ragged group tail
    (256, 20000, 0.01, 3),    # n > 16384: multi-tile gather
])
def test_spmv_routed_scipy_parity(m, n, dens, seed):
    a = st.random(m, n, dens, format="csr", random_state=seed)
    x = np.random.default_rng(seed + 9).standard_normal(n).astype(
        np.float32)
    plan = _plan(a)
    assert plan is not None
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    ref = _scipy(a) @ x
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(y, ref, atol=4e-7 * scale)


def test_spmv_routed_tables_are_valid_coloring():
    """Every entry lands at a unique (lane-row, sublane) gather slot and
    a unique (lane-row, row-slot) route slot — the plan invariants the
    kernels rely on."""
    a = st.random(700, 600, 0.03, format="csr", random_state=8)
    plan = _plan(a)
    assert plan is not None
    route = np.asarray(plan.route_tbl)
    vals = np.asarray(plan.val_tbl)
    # number of live routed slots == nnz (no collision overwrote one)
    assert int((route >= 0).sum()) == a.nnz
    # every nonzero value slot is consumed by exactly one route
    assert int((vals != 0).sum()) <= a.nnz


def test_spmv_routed_deterministic():
    a = st.random(500, 500, 0.02, format="csr", random_state=11)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(500)
                    .astype(np.float32))
    plan = _plan(a)
    y1 = np.asarray(spmv_routed(x, plan, interpret=True))
    y2 = np.asarray(spmv_routed(x, plan, interpret=True))
    assert np.array_equal(y1.view(np.uint32), y2.view(np.uint32))


def test_spmv_routed_plan_rejects_huge_n():
    a = st.random(64, 140000, 0.0005, format="csr", random_state=2)
    assert _plan(a) is None


def test_spmv_routed_empty():
    a = st.random(64, 64, 0.0, format="csr", random_state=2)
    assert _plan(a) is None


def test_spmm_routed_scipy_parity():
    """Multi-vector execution over the same plan (cuSPARSE SpMM
    analogue, cusparse.py:1440-1514)."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    a = st.random(300, 260, 0.04, format="csr", random_state=6)
    plan = _plan(a)
    X = np.random.default_rng(2).standard_normal((260, 13)).astype(
        np.float32)
    Y = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    ref = _scipy(a) @ X
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(Y, ref, atol=4e-7 * scale)


def test_spmm_plan_dispatch():
    """ops.spmm honors a routed plan tuple (CPU: plan is None, but the
    code path with an explicit interpret-built plan must agree)."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    a = st.random(120, 90, 0.06, format="csr", random_state=3)
    plan = ("routed", _plan(a))
    X = np.random.default_rng(5).standard_normal((90, 4)).astype(
        np.float32)
    # direct kernel in interpret mode == scipy; the spmm wrapper uses
    # the compiled path, so compare wrapper vs kernel only on TPU
    Yk = np.asarray(spmm_routed(jnp.asarray(X), plan[1], interpret=True))
    ref = _scipy(a) @ X
    np.testing.assert_allclose(Yk, ref, atol=4e-7 * max(np.abs(ref).max(),
                                                        1e-30))
