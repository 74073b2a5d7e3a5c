"""bfloat16 container coverage — TPU's native dtype must flow end-to-end."""

import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st


@pytest.fixture
def pair16():
    A = st.random(48, 40, 0.2, format="csr", random_state=0,
                  dtype=jnp.bfloat16)
    B = st.random(40, 36, 0.2, format="csr", random_state=1,
                  dtype=jnp.bfloat16)
    return A, B


@pytest.mark.parametrize("alg", [1, 2, 3])
def test_spgemm_bf16(pair16, alg):
    A, B = pair16
    C = st.spgemm(A, B, alg=alg, chunk_fraction=0.3)
    assert C.dtype == jnp.bfloat16
    ref = (A.to_scipy() @ B.to_scipy()).toarray()
    np.testing.assert_allclose(np.asarray(C.toarray()).astype(np.float32),
                               ref, rtol=0.05, atol=0.05)
    # structural parity: bf16 inputs contain explicit zeros (uniform rounds
    # to 0), which stay structural under cuSPARSE semantics; scipy's matmul
    # prunes zero products, so compare against the pattern product instead.
    import scipy.sparse as sp

    As, Bs = A.to_scipy(), B.to_scipy()
    Ap = sp.csr_matrix((np.ones(As.nnz), As.indices, As.indptr),
                       shape=As.shape)
    Bp = sp.csr_matrix((np.ones(Bs.nnz), Bs.indices, Bs.indptr),
                       shape=Bs.shape)
    assert C.nnz == (Ap @ Bp).nnz


def test_spgemm_bf16_algs_agree_structurally(pair16):
    A, B = pair16
    C1 = st.spgemm(A, B, alg=1)
    C2 = st.spgemm(A, B, alg=2)
    np.testing.assert_array_equal(np.asarray(C1.indptr),
                                  np.asarray(C2.indptr))
    np.testing.assert_array_equal(np.asarray(C1.indices),
                                  np.asarray(C2.indices))


def test_spmv_spmm_bf16(pair16):
    A, _ = pair16
    y = st.spmv(A, jnp.ones(40, jnp.bfloat16))
    assert y.dtype == jnp.bfloat16
    Z = st.spmm(A, jnp.ones((40, 8), jnp.bfloat16))
    assert Z.dtype == jnp.bfloat16
    ref = A.to_scipy() @ np.ones(40, np.float32)
    np.testing.assert_allclose(np.asarray(y).astype(np.float32), ref,
                               rtol=0.05, atol=0.05)


def test_container_roundtrip_bf16(pair16):
    A, _ = pair16
    for fmt in ("coo", "csc", "csr"):
        got = A.asformat(fmt)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(got.toarray()).astype(np.float32),
            np.asarray(A.toarray()).astype(np.float32))
