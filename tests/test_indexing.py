"""Indexing + data-op tests (reference _index.py/_data.py surface)."""

import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st


@pytest.fixture
def pair():
    A = st.random(30, 40, density=0.2, format="csr", random_state=0)
    return A, A.to_scipy()


def test_single_row(pair):
    A, As = pair
    np.testing.assert_allclose(np.asarray(A[3].toarray()),
                               As[3].toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A[-1].toarray()),
                               As[-1].toarray(), rtol=1e-6)


def test_row_slice(pair):
    A, As = pair
    np.testing.assert_allclose(np.asarray(A[5:12].toarray()),
                               As[5:12].toarray(), rtol=1e-6)
    assert A[4:4].shape == (0, 40)


def test_element(pair):
    A, As = pair
    for i, j in [(0, 0), (3, 7), (29, 39)]:
        np.testing.assert_allclose(np.asarray(A[i, j]), As[i, j],
                                   rtol=1e-6)


def test_col_slice(pair):
    A, As = pair
    np.testing.assert_allclose(np.asarray(A[:, 10:25].toarray()),
                               As[:, 10:25].toarray(), rtol=1e-6)


def test_row_array(pair):
    A, As = pair
    rows = np.array([2, 17, 2, 29])
    np.testing.assert_allclose(np.asarray(A[rows].toarray()),
                               As[rows].toarray(), rtol=1e-6)


def test_row_then_colslice(pair):
    A, As = pair
    np.testing.assert_allclose(np.asarray(A[4, 3:17].toarray()),
                               As[4, 3:17].toarray(), rtol=1e-6)


def test_data_ops(pair):
    A, As = pair
    B = A - A * 2.0  # make negatives
    Bs = As - As * 2.0
    np.testing.assert_allclose(np.asarray(abs(B).toarray()),
                               abs(Bs).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.power(2).toarray()),
                               As.power(2).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.sqrt().toarray()),
                               As.sqrt().toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(B.sign().toarray()),
                               Bs.sign().toarray(), rtol=1e-6)
    assert A.count_nonzero() == As.count_nonzero()
    with pytest.raises(ValueError):
        A.maximum_scalar(1.0)


def _pair(m=20, n=16, d=0.3, seed=5):
    A = st.random(m, n, d, format="csr", random_state=seed)
    return A, A.to_scipy()


def test_boolean_row_mask():
    A, As = _pair()
    mask = np.zeros(20, bool)
    mask[[1, 4, 7, 15]] = True
    got = A[mask]
    want = As[mask]
    np.testing.assert_allclose(np.asarray(got.toarray()), want.toarray())


def test_strided_row_slice():
    A, As = _pair()
    for sl in (slice(None, None, 2), slice(1, 18, 3), slice(None, None, -1)):
        got = A[sl]
        want = As[np.arange(20)[sl]]
        np.testing.assert_allclose(np.asarray(got.toarray()),
                                   want.toarray())


def test_column_array_indexing():
    A, As = _pair()
    cols = np.array([3, 0, 3, 9])  # duplicates + out of order
    got = A[:, cols]
    want = As[:, cols]
    np.testing.assert_allclose(np.asarray(got.toarray()), want.toarray())


def test_strided_column_slice():
    A, As = _pair()
    got = A[:, ::2]
    want = As[:, ::2]
    np.testing.assert_allclose(np.asarray(got.toarray()), want.toarray())


def test_row_col_pair_indexing():
    A, As = _pair()
    rows = np.array([0, 3, 7, 19, 3])
    cols = np.array([5, 2, 0, 15, 2])
    got = A[rows, cols]
    want = np.asarray(As[rows, cols]).ravel()
    np.testing.assert_allclose(np.asarray(got).ravel(), want)


def test_setitem_scalar():
    A, As = _pair()
    As = As.tolil()
    A[2, 3] = 7.5        # overwrite-or-insert
    As[2, 3] = 7.5
    A[0, 0] = -1.0
    As[0, 0] = -1.0
    np.testing.assert_allclose(np.asarray(A.toarray()),
                               As.toarray())
    assert A.has_canonical_format


def test_setitem_unsupported_raises():
    A, _ = _pair()
    with pytest.raises(NotImplementedError):
        A[0] = 1.0
