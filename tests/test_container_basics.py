"""Container-surface basics mirrored from the reference's test_csr.py
TestCsrMatrix* behaviors: iteration, len, asfptype, toarray order
arguments, scalar dot, constructor component validation, reshape/resize,
out-of-range IndexError.
"""

import numpy as np
import pytest

import spmm_tpu as st


def _mat():
    return st.CSR(np.array([[1., 0, 2], [0, 3, 0], [4, 0, 5]], np.float32))


def test_len_raises():
    with pytest.raises(TypeError):
        len(_mat())


def test_iter_rows():
    A = _mat()
    rows = [np.asarray(r.toarray()).ravel() for r in A]
    assert len(rows) == 3
    np.testing.assert_allclose(np.stack(rows), np.asarray(A.toarray()))


def test_iter_rows_coo():
    A = _mat().tocoo()
    assert len([r for r in A]) == 3


def test_getitem_out_of_range():
    A = _mat()
    with pytest.raises(IndexError):
        A[3]
    with pytest.raises(IndexError):
        A[-4]
    with pytest.raises(IndexError):
        A[0, 3]
    with pytest.raises(IndexError):
        A[[0, 5]]
    # negative indices wrap like numpy
    np.testing.assert_allclose(np.asarray(A[-1].toarray()).ravel(),
                               [4, 0, 5])


def test_asfptype():
    A = _mat()
    assert A.asfptype() is A
    B = A.astype(np.int32)
    assert B.asfptype().dtype == np.float32


@pytest.mark.parametrize("order", [None, "C", "F"])
def test_toarray_order(order):
    A = _mat()
    np.testing.assert_allclose(np.asarray(A.toarray(order=order)),
                               np.asarray(A.toarray()))


def test_toarray_unknown_order():
    with pytest.raises(TypeError):
        _mat().toarray(order="K")


def test_dot_scalar():
    A = _mat()
    got = A.dot(2.0)
    np.testing.assert_allclose(np.asarray(got.toarray()),
                               np.asarray(A.toarray()) * 2)
    with pytest.raises(ValueError):
        A @ 2.0  # matmul still rejects scalars


@pytest.mark.parametrize("cls", [st.CSR, st.CSC])
def test_component_validation(cls):
    data = np.array([1., 2, 3], np.float32)
    idx = np.array([0, 2, 1])
    ptr = np.array([0, 2, 3])
    ok = cls((data, idx, ptr), shape=(2, 3) if cls is st.CSR else (3, 2))
    assert ok.nnz == 3
    with pytest.raises(ValueError):  # data/indices length mismatch
        cls((data[:2], idx, ptr), shape=(2, 3))
    bad_shape = (3, 3) if cls is st.CSR else (2, 3)  # major+1 != 3
    with pytest.raises(ValueError):  # indptr length != major+1
        cls((data, idx, ptr), shape=bad_shape)
    with pytest.raises(ValueError):  # 2-D data
        cls((data[None, :], idx, ptr), shape=(2, 3))


@pytest.mark.parametrize("order", ["C", "F"])
@pytest.mark.parametrize("shape", [(9, 1), (1, 9), (3, 3)])
def test_reshape(order, shape):
    import scipy.sparse as sp

    A = _mat()
    S = sp.csr_matrix(np.asarray(A.toarray()))
    got = A.reshape(shape, order=order)
    want = S.reshape(shape, order=order)
    assert got.format == "csr"
    np.testing.assert_allclose(np.asarray(got.toarray()), want.toarray())


def test_reshape_invalid():
    with pytest.raises(ValueError):
        _mat().reshape((2, 4))


def test_resize():
    A = _mat()
    assert A.resize((2, 2)) is None
    assert A.shape == (2, 2)
    np.testing.assert_allclose(np.asarray(A.toarray()),
                               [[1, 0], [0, 3]])
    A2 = _mat()
    A2.resize((4, 4))
    assert A2.shape == (4, 4)
    assert A2.nnz == 5
