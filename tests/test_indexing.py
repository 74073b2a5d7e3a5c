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
