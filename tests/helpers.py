"""Shared test helpers: scipy cross-checks (the reference's golden-reference
style, tests/cupyx_tests/scipy_tests/sparse_tests uses
`@testing.numpy_cupy_allclose(sp_name='sp')` — here we compare explicitly)."""

import numpy as np
import scipy.sparse as sp

import spmm_tpu as st


def make_pair(m, k, n, da, db, seed=0, dtype=np.float32):
    A = st.random(m, k, density=da, format="csr", random_state=seed,
                  dtype=dtype)
    B = st.random(k, n, density=db, format="csr", random_state=seed + 1,
                  dtype=dtype)
    return A, B, A.to_scipy(), B.to_scipy()


def assert_csr_equal_structure(c, c_ref):
    """Bitwise structural equality (indptr + indices), scipy canonical."""
    c_ref = c_ref.tocsr()
    c_ref.sort_indices()
    c_ref.sum_duplicates()
    np.testing.assert_array_equal(np.asarray(c.indptr), c_ref.indptr)
    np.testing.assert_array_equal(np.asarray(c.indices), c_ref.indices)


def assert_sparse_allclose(c, c_ref, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(c.toarray()),
        c_ref.toarray() if sp.issparse(c_ref) else np.asarray(c_ref),
        rtol=rtol, atol=atol)
