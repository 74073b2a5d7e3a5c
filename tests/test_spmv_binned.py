"""Binned lane-gather SpMV (kernels/spmv_binned): SciPy parity in
interpret mode, plan edge cases, and the spmv(..., plan=spmv_plan(a))
wrapper contract."""

import numpy as np
import pytest

import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.ops.kernels.spmv_binned import (spmv_binned,
                                              spmv_binned_plan)


def _scipy(a):
    from scipy import sparse as sp

    return sp.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                          np.asarray(a.indptr)), shape=a.shape)


def _plan(a):
    m, n = a.shape
    return spmv_binned_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), m, n)


@pytest.mark.parametrize("m,n,dens,seed", [
    (300, 256, 0.05, 0),
    (1000, 1000, 0.01, 1),
    (130, 1000, 0.002, 2),
    (256, 16384, 0.001, 3),   # n at the plan's gather ceiling
    (64, 64, 0.3, 4),
    (129, 200, 0.08, 5),      # ragged group tail
])
def test_spmv_binned_scipy_parity(m, n, dens, seed):
    a = st.random(m, n, dens, format="csr", random_state=seed)
    x = np.random.default_rng(seed + 9).standard_normal(n).astype(
        np.float32)
    plan = _plan(a)
    assert plan is not None
    y = np.asarray(spmv_binned(jnp.asarray(x), plan, interpret=True))
    ref = _scipy(a) @ x
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(y, ref, atol=4e-7 * scale)


def test_spmv_binned_deterministic():
    a = st.random(500, 500, 0.02, format="csr", random_state=11)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(500)
                    .astype(np.float32))
    plan = _plan(a)
    y1 = np.asarray(spmv_binned(x, plan, interpret=True))
    y2 = np.asarray(spmv_binned(x, plan, interpret=True))
    assert np.array_equal(y1.view(np.uint32), y2.view(np.uint32))


def test_spmv_binned_wide_n_multi_tile():
    # n > 16384 rides the C-tile gather (select chain over x tiles)
    a = st.random(64, 20000, 0.01, format="csr", random_state=2)
    plan = _plan(a)
    assert plan is not None and plan.C * 16384 // plan.R >= 20000
    x = np.random.default_rng(4).standard_normal(20000).astype(np.float32)
    y = np.asarray(spmv_binned(jnp.asarray(x), plan, interpret=True))
    ref = _scipy(a) @ x
    np.testing.assert_allclose(y, ref, atol=4e-7 * max(np.abs(ref).max(),
                                                       1e-30))


def test_spmv_binned_plan_rejects_huge_n():
    a = st.random(64, 140000, 0.0005, format="csr", random_state=2)
    assert _plan(a) is None


def test_spmv_binned_empty():
    a = st.random(64, 64, 0.0, format="csr", random_state=2)
    assert _plan(a) is None


def test_spmv_plan_wrapper_cpu_is_none():
    # on CPU the TPU kernels do not apply; plan must be None and spmv
    # must still work through the gather+segment-sum path
    a = st.random(100, 100, 0.05, format="csr", random_state=3)
    assert st.spmv_plan(a) is None
    x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
    y = np.asarray(st.spmv(a, x))
    np.testing.assert_allclose(y, _scipy(a) @ x, rtol=2e-5, atol=1e-6)
