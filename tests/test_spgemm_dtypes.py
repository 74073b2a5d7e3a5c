"""Op-level dtype parity — the TestSpgemm analogue.

The reference parameterizes its SpGEMM op tests over
float32/float64/complex64/complex128 and asserts
`spgemm(a, b, alpha) ≈ alpha * a.dot(b)` vs SciPy (/root/reference
modify_src/cupy-src/tests/cupyx_tests/test_cusparse.py:144,373-410).
Wide dtypes (itemsize > 4) ride the entry-id-broadcast + gather
transport in the ESC engines and plain promoted matmuls in the dense
engines; f64/complex require x64, enabled per-test via
`jax.enable_x64`."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.sparse.csr import CSR

DTYPES = [np.float32, np.float64, np.complex64, np.complex128]


def _make_pair(dt, m=40, k=36, n=30, da=0.15, db=0.12, seed=0):
    rng = np.random.default_rng(seed)
    As = sp.random(m, k, da, format="csr", random_state=1)
    Bs = sp.random(k, n, db, format="csr", random_state=2)

    def vals(nnz):
        v = rng.standard_normal(nnz)
        if np.issubdtype(dt, np.complexfloating):
            v = v + 1j * rng.standard_normal(nnz)
        return v.astype(dt)

    As.data, Bs.data = vals(As.nnz), vals(Bs.nnz)
    return As, Bs


def _tol(dt):
    return 1e-5 if np.dtype(dt).itemsize <= 8 else 1e-12


@pytest.mark.parametrize("dt", DTYPES, ids=[np.dtype(d).name
                                            for d in DTYPES])
@pytest.mark.parametrize("alg", [1, 2, 3])
@pytest.mark.parametrize("impl", ["dense", "esc"])
def test_spgemm_dtype_parity(dt, alg, impl):
    if alg == 1 and impl == "esc":
        pytest.skip("alg1 has a single engine")
    with jax.enable_x64(True):
        As, Bs = _make_pair(dt)
        A, B = CSR.from_scipy(As), CSR.from_scipy(Bs)
        alpha = 2.0 + (0.5j if np.issubdtype(dt, np.complexfloating)
                       else 0.0)
        C = st.spgemm(A, B, alpha=alpha, alg=alg, chunk_fraction=0.3,
                      impl=impl)
        assert C.dtype == np.dtype(dt)
        ref = alpha * (As @ Bs).toarray()
        scale = max(np.abs(ref).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(C.toarray()), ref,
                                   atol=_tol(dt) * scale)
        ref_csr = (As @ Bs).tocsr()
        ref_csr.sort_indices()
        np.testing.assert_array_equal(np.asarray(C.indptr),
                                      ref_csr.indptr)
        np.testing.assert_array_equal(np.asarray(C.indices),
                                      ref_csr.indices)


@pytest.mark.parametrize("dt", DTYPES, ids=[np.dtype(d).name
                                            for d in DTYPES])
def test_spgemm_dtype_deterministic(dt):
    """Bitwise rerun stability holds for every dtype (the reference's
    determinism property, deterministic/test_deterministic.sh)."""
    with jax.enable_x64(True):
        As, Bs = _make_pair(dt, seed=3)
        A, B = CSR.from_scipy(As), CSR.from_scipy(Bs)
        C1 = st.spgemm(A, B, alg=2, impl="esc")
        C2 = st.spgemm(A, B, alg=2, impl="esc")
        assert np.array_equal(
            np.asarray(C1.data).view(np.uint8),
            np.asarray(C2.data).view(np.uint8))


def test_spgemm_mixed_dtypes_promote():
    """Mixed operand dtypes promote to the common type before compute
    (cusparse.py:2039 _cast_common_type)."""
    with jax.enable_x64(True):
        As, _ = _make_pair(np.float32)
        _, Bs = _make_pair(np.float64)
        A, B = CSR.from_scipy(As), CSR.from_scipy(Bs)
        C = st.spgemm(A, B, alg=2)
        assert C.dtype == jnp.float64
        ref = (As.astype(np.float64) @ Bs).toarray()
        np.testing.assert_allclose(np.asarray(C.toarray()), ref,
                                   rtol=1e-6, atol=1e-12)


@pytest.mark.parametrize("dt", [np.float64, np.complex128])
def test_spmv_spmm_wide_dtypes(dt):
    with jax.enable_x64(True):
        As, _ = _make_pair(dt)
        A = CSR.from_scipy(As)
        rng = np.random.default_rng(4)
        x = rng.standard_normal(36).astype(dt)
        X = rng.standard_normal((36, 5)).astype(dt)
        y = st.spmv(A, jnp.asarray(x))
        Z = st.spmm(A, jnp.asarray(X))
        assert y.dtype == np.dtype(dt) and Z.dtype == np.dtype(dt)
        np.testing.assert_allclose(np.asarray(y), As @ x, rtol=1e-10)
        np.testing.assert_allclose(np.asarray(Z), As @ X, rtol=1e-10)


def test_spgemm_empty_wide_dtype():
    with jax.enable_x64(True):
        A = CSR.from_scipy(sp.csr_matrix((8, 6), dtype=np.complex128))
        B = CSR.from_scipy(sp.csr_matrix((6, 4), dtype=np.complex128))
        C = st.spgemm(A, B, alg=2)
        assert C.nnz == 0 and C.dtype == jnp.complex128
