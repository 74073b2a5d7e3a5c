"""One-hot MXU SpMV kernel (kernels/spmv_onehot) — CPU interpret-mode
correctness vs SciPy, plan boundaries, and the ops.spmv auto-route
contract.  On TPU the kernel measured 0.4-0.5 Gnnz/s at 10k/1e-3 (round-1
gather+segsum path: 0.024 Gnnz/s)."""

import numpy as np
import jax.numpy as jnp
import pytest

import spmm_tpu as st
from spmm_tpu.ops.kernels.spmv_onehot import (spmv_onehot,
                                              spmv_onehot_plan)


@pytest.mark.parametrize(
    "m,n,density,seed,ch,u",
    [(100, 130, 0.1, 0, 64, 4), (256, 256, 0.05, 1, 128, 2),
     (64, 1024, 0.3, 2, 256, 2), (333, 77, 0.2, 3, 128, 4)])
def test_spmv_onehot_scipy_parity(m, n, density, seed, ch, u):
    rng = np.random.default_rng(seed)
    A = st.random(m, n, density, format="csr", random_state=seed)
    x = rng.standard_normal(n).astype(np.float32)
    plan = spmv_onehot_plan(np.asarray(A.indptr), m, n, ch=ch, unroll=u)
    assert plan is not None
    y = spmv_onehot(A.indptr, A.indices, A.data, jnp.asarray(x), m, n,
                    plan, interpret=True)
    ref = A.to_scipy() @ x
    # f32 accumulation in a different (fixed) order than scipy's: abs
    # error scales with the row-sum magnitude, not the result (norm data
    # cancels), so compare with a magnitude-scaled atol
    scale = float(np.abs(A.to_scipy()).dot(np.abs(x)).max()) + 1.0
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5,
                               atol=3e-6 * scale)


def test_spmv_onehot_deterministic_rerun():
    A = st.random(128, 128, 0.2, format="csr", random_state=7)
    x = jnp.asarray(np.random.default_rng(1).random(128, ).astype(np.float32))
    plan = spmv_onehot_plan(np.asarray(A.indptr), 128, 128, ch=64, unroll=2)
    y1 = spmv_onehot(A.indptr, A.indices, A.data, x, 128, 128, plan,
                     interpret=True)
    y2 = spmv_onehot(A.indptr, A.indices, A.data, x, 128, 128, plan,
                     interpret=True)
    assert np.array_equal(np.asarray(y1), np.asarray(y2))


def test_spmv_onehot_plan_boundaries():
    A = st.CSR((6, 8), dtype=jnp.float32)
    assert spmv_onehot_plan(np.asarray(A.indptr), 6, 8) is None
    # x too wide for VMEM
    indptr = np.array([0, 1], np.int32)
    assert spmv_onehot_plan(indptr, 1, 10_000_000) is None


def test_spmv_auto_route_matches_csr_path():
    # on CPU "auto" must fall back to the gather path and agree with it
    A = st.random(60, 45, 0.15, format="csr", random_state=4)
    x = jnp.asarray(np.random.default_rng(2).random(45).astype(np.float32))
    y_auto = st.spmv(A, x)
    y_csr = st.spmv(A, x, via="csr")
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_csr),
                               rtol=1e-6)
    with pytest.raises(ValueError):
        st.spmv(A, x, via="onehot")  # kernel unavailable on CPU backend
