"""Constructor tests: `random` semantics mirror the reference's
`sp.random` (cupyx _construct.py:321-374 — exactly int(density*m*n) distinct
nonzeros, data_rvs values), plus eye/identity/spdiags/diags/bmat scipy parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import spmm_tpu as st


@pytest.mark.parametrize("density", [0.0, 0.01, 0.1, 0.5])
def test_random_nnz_exact(density):
    m, n = 64, 48
    A = st.random(m, n, density=density, format="coo", random_state=0)
    assert A.nnz == int(density * m * n)


def test_random_positions_distinct():
    A = st.random(50, 40, density=0.3, format="coo", random_state=3)
    pos = set(zip(np.asarray(A.row).tolist(), np.asarray(A.col).tolist()))
    assert len(pos) == A.nnz


def test_random_reproducible():
    A = st.random(32, 32, density=0.2, format="csr", random_state=7)
    B = st.random(32, 32, density=0.2, format="csr", random_state=7)
    np.testing.assert_array_equal(np.asarray(A.indices), np.asarray(B.indices))
    np.testing.assert_array_equal(np.asarray(A.data), np.asarray(B.data))
    C = st.random(32, 32, density=0.2, format="csr", random_state=8)
    assert not np.array_equal(np.asarray(A.data), np.asarray(C.data))


def test_random_data_rvs():
    # JAX-native data_rvs(key, shape, dtype)
    A = st.random(32, 32, density=0.2, random_state=0,
                  data_rvs=lambda key, shape, dtype: jax.random.uniform(
                      key, shape, dtype, minval=5.0, maxval=6.0))
    d = np.asarray(A.data)
    assert (d >= 5.0).all() and (d < 6.0).all()
    # numpy-style data_rvs(k) also accepted (scipy compat)
    B = st.random(32, 32, density=0.2, random_state=0,
                  data_rvs=lambda k: np.full(k, 2.5))
    assert (np.asarray(B.data) == 2.5).all()


def test_random_formats():
    for fmt, cls in [("coo", st.COO), ("csr", st.CSR), ("csc", st.CSC)]:
        A = st.random(16, 24, density=0.1, format=fmt, random_state=0)
        assert isinstance(A, cls)
        assert A.shape == (16, 24)


def test_random_bad_density():
    with pytest.raises(ValueError):
        st.random(8, 8, density=1.5)


@pytest.mark.parametrize("k", [-2, 0, 3])
def test_eye(k):
    got = st.eye(6, 8, k=k, format="csr").toarray()
    np.testing.assert_array_equal(np.asarray(got),
                                  sp.eye(6, 8, k=k).toarray())


def test_identity():
    np.testing.assert_array_equal(
        np.asarray(st.identity(5, format="csr").toarray()), np.eye(5))


def test_spdiags():
    data = np.array([[1, 2, 3, 4.0], [5, 6, 7, 8.0]])
    diags = [0, -1]
    got = st.spdiags(data, diags, 4, 4, format="csr").toarray()
    want = sp.spdiags(data, diags, 4, 4).toarray()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_diags():
    got = st.diags([np.array([1.0, 2, 3]), np.array([4.0, 5])],
                   [0, 1], format="csr").toarray()
    want = sp.diags([[1, 2, 3], [4, 5]], [0, 1]).toarray()
    np.testing.assert_array_equal(np.asarray(got), want)


def test_bmat_hstack_vstack():
    A = st.random(4, 5, density=0.4, format="csr", random_state=0)
    B = st.random(4, 3, density=0.4, format="csr", random_state=1)
    As, Bs = A.to_scipy(), B.to_scipy()
    got = st.bmat([[A, B]], format="csr").toarray()
    np.testing.assert_allclose(np.asarray(got),
                               sp.bmat([[As, Bs]]).toarray(), rtol=1e-6)
    got = st.bmat([[A, None], [None, A]], format="csr").toarray()
    np.testing.assert_allclose(np.asarray(got),
                               sp.bmat([[As, None], [None, As]]).toarray(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st.hstack([A, B]).toarray()),
                               sp.hstack([As, Bs]).toarray(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.vstack([A, A]).toarray()),
        sp.vstack([As, As]).toarray(), rtol=1e-6)
