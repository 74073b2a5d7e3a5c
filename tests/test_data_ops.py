"""Parity tests for the `_data.py`-surface ops: unary ufuncs, axis
min/max (incl. explicit=), argmax/argmin, getnnz(axis).

Reference: cupyx/scipy/sparse/_data.py (_ufuncs list, _minmax_mixin) and
the scipy behaviors its tests assert.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import spmm_tpu as st
from spmm_tpu.sparse import construct

UFUNCS = [
    "arcsin", "arcsinh", "arctan", "arctanh", "ceil", "deg2rad", "expm1",
    "floor", "log1p", "rad2deg", "rint", "sign", "sin", "sinh", "sqrt",
    "tan", "tanh", "trunc",
]


def _rand(m, n, d, seed, fmt="csr", positive=False):
    A = construct.random(m, n, density=d, random_state=seed,
                         dtype=np.float32).asformat(fmt)
    if positive:
        A = A._with_data(abs(np.asarray(A.data)) * 0.9 + 0.05)
    return A


@pytest.mark.parametrize("name", UFUNCS)
@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_unary_ufunc(name, fmt):
    # keep values inside every ufunc's domain: (0, 1)
    A = _rand(23, 17, 0.2, 3, fmt, positive=True)
    S = sp.csr_matrix(np.asarray(A.toarray()))
    got = getattr(A, name)()
    assert got.shape == A.shape and got.nnz == A.nnz
    want = getattr(np, name)(S.toarray() * (S.toarray() != 0)) \
        * (S.toarray() != 0)
    np.testing.assert_allclose(np.asarray(got.toarray()), want,
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("which", ["max", "min"])
@pytest.mark.parametrize("axis", [None, 0, 1, -1, -2])
@pytest.mark.parametrize("fmt", ["csr", "csc", "coo"])
def test_minmax_axis(which, axis, fmt):
    A = _rand(19, 31, 0.25, 7, fmt)
    S = sp.csr_matrix(np.asarray(A.toarray()))
    got = getattr(A, which)(axis=axis)
    want = getattr(S, which)(axis=axis)
    if axis is None:
        assert float(got) == pytest.approx(float(want), rel=1e-6)
    else:
        np.testing.assert_allclose(np.asarray(got.toarray()),
                                   want.toarray(), rtol=1e-6)


@pytest.mark.parametrize("which", ["max", "min"])
def test_minmax_explicit(which):
    # a row with no stored entries and rows where 0 beats the stored values
    dense = np.array([[0.0, -2.0, 0.0],
                      [0.0, 0.0, 0.0],
                      [3.0, 1.0, 2.0]], np.float32)
    A = st.CSR(dense)
    got = getattr(A, which)(axis=1, explicit=True)
    stored_red = ([-2.0, 0.0, 3.0] if which == "max" else [-2.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(got.toarray()).ravel(), stored_red)
    g0 = getattr(A, which)(axis=None, explicit=True)
    assert float(g0) == (3.0 if which == "max" else -2.0)


def test_minmax_full_matrix_no_zero_compete():
    dense = np.arange(1, 13, dtype=np.float32).reshape(3, 4)
    A = st.CSR(dense)
    assert float(A.min()) == 1.0  # no implicit zero to compete
    assert float(A.max()) == 12.0


def test_minmax_empty_and_errors():
    A = st.CSR(np.zeros((3, 4), np.float32))
    assert float(A.max()) == 0.0 and float(A.min()) == 0.0
    with pytest.raises(ValueError):
        A.max(axis=2)
    with pytest.raises(ValueError):
        A.max(axis=0, out=np.zeros(4))


@pytest.mark.parametrize("which", ["argmax", "argmin"])
@pytest.mark.parametrize("axis", [None, 0, 1])
def test_argminmax(which, axis):
    rng = np.random.default_rng(11)
    dense = np.where(rng.random((9, 13)) < 0.3,
                     rng.standard_normal((9, 13)), 0.0).astype(np.float32)
    A = st.CSR(dense)
    npop = np.argmax if which == "argmax" else np.argmin
    got = getattr(A, which)(axis=axis)
    if axis is None:
        assert got == int(npop(dense))
    else:
        np.testing.assert_array_equal(np.asarray(got).ravel(),
                                      npop(dense, axis=axis))


def test_getnnz_axis():
    A = _rand(12, 18, 0.3, 5)
    S = sp.csr_matrix(np.asarray(A.toarray()))
    assert A.getnnz() == S.getnnz()
    np.testing.assert_array_equal(A.getnnz(axis=0), S.getnnz(axis=0))
    np.testing.assert_array_equal(A.getnnz(axis=1), S.getnnz(axis=1))
    with pytest.raises(ValueError):
        A.getnnz(axis=2)
