"""maximum/minimum, comparison operators, setdiag, getcol.

Ports the reference's container test surface (modify_src/cupy-src/tests/
cupyx_tests/scipy_tests/sparse_tests/test_csr.py:
TestCsrMatrixMaximumMinimum, TestCsrMatrixComparison,
TestCsrMatrixDiagonal.test_setdiag, test_getcol) to the TPU containers —
every case evaluated against scipy/numpy on the same matrix.
"""

import warnings

import numpy as np
import pytest

import spmm_tpu as st


def _mk(shape=(10, 12), d=0.35, seed=7, signed=True):
    A = st.random(*shape, d, format="csr", random_state=seed)
    if signed:
        A = A - A.power(2)  # mix of signs
    return A, np.asarray(A.toarray())


def _dense(x):
    return np.asarray(x.toarray() if hasattr(x, "toarray") else x)


# -- maximum / minimum -------------------------------------------------------

@pytest.mark.parametrize("opt", ["maximum", "minimum"])
def test_extremum_sparse_sparse(opt):
    A, Ad = _mk(seed=1)
    B, Bd = _mk(seed=2)
    got = getattr(A, opt)(B)
    want = getattr(np, opt)(Ad, Bd)
    np.testing.assert_allclose(_dense(got), want)


@pytest.mark.parametrize("opt", ["maximum", "minimum"])
def test_extremum_sparse_row_broadcast(opt):
    """(1, n) sparse rhs broadcasts (cupy extension over scipy)."""
    A, Ad = _mk(seed=3)
    B, Bd = _mk(shape=(1, 12), d=0.5, seed=4)
    got = getattr(A, opt)(B)
    want = getattr(np, opt)(Ad, Bd)
    np.testing.assert_allclose(_dense(got), want)


@pytest.mark.parametrize("opt", ["maximum", "minimum"])
def test_extremum_sparse_col_broadcast(opt):
    A, Ad = _mk(seed=5)
    B, Bd = _mk(shape=(10, 1), d=0.5, seed=6)
    got = getattr(A, opt)(B)
    want = getattr(np, opt)(Ad, Bd)
    np.testing.assert_allclose(_dense(got), want)


@pytest.mark.parametrize("opt", ["maximum", "minimum"])
def test_extremum_dense(opt):
    A, Ad = _mk(seed=7)
    B, Bd = _mk(seed=8)
    got = getattr(A, opt)(Bd)
    want = getattr(np, opt)(Ad, Bd)
    np.testing.assert_allclose(_dense(got), want)


@pytest.mark.parametrize("opt,s", [("maximum", 0.5), ("maximum", -0.5),
                                   ("minimum", 0.5), ("minimum", -0.5),
                                   ("maximum", 0.0), ("minimum", 0.0)])
def test_extremum_scalar(opt, s):
    A, Ad = _mk(seed=9)
    got = getattr(A, opt)(s)
    want = getattr(np, opt)(Ad, s)
    np.testing.assert_allclose(_dense(got), want)
    densifies = (opt == "maximum" and s > 0) or (opt == "minimum" and s < 0)
    assert st.issparse(got) != densifies


@pytest.mark.parametrize("opt", ["maximum", "minimum"])
def test_extremum_ng_shape(opt):
    A, _ = _mk()
    for shape in [(9, 12), (11, 12), (10, 11), (10, 13)]:
        B, _ = _mk(shape=shape, seed=10)
        with pytest.raises(ValueError):
            getattr(A, opt)(B)


# -- comparisons -------------------------------------------------------------

_OPS = [("eq", np.equal), ("ne", np.not_equal), ("lt", np.less),
        ("gt", np.greater), ("le", np.less_equal), ("ge", np.greater_equal)]


def _cmp(a, b, name):
    import operator

    return getattr(operator, name)(a, b)


@pytest.mark.parametrize("name,npop", _OPS)
def test_compare_sparse(name, npop):
    A, Ad = _mk(seed=11)
    B, Bd = _mk(seed=12)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = _cmp(A, B, name)
    np.testing.assert_array_equal(_dense(got), npop(Ad, Bd))


@pytest.mark.parametrize("name,npop", _OPS)
def test_compare_dense(name, npop):
    A, Ad = _mk(seed=13)
    _, Bd = _mk(seed=14)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = _cmp(A, Bd, name)
    np.testing.assert_array_equal(_dense(got), npop(Ad, Bd))


@pytest.mark.parametrize("name,npop", _OPS)
@pytest.mark.parametrize("s", [0.5, -0.5, 0.0])
def test_compare_scalar(name, npop, s):
    A, Ad = _mk(seed=15)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = _cmp(A, s, name)
    np.testing.assert_array_equal(_dense(got), npop(Ad, s))


def test_compare_scalar_nan():
    A, Ad = _mk(seed=16)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = A != np.nan
    np.testing.assert_array_equal(_dense(got), Ad != np.nan)


def test_compare_row_broadcast():
    A, Ad = _mk(seed=17)
    B, Bd = _mk(shape=(1, 12), d=0.5, seed=18)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        got = A < B
    np.testing.assert_array_equal(_dense(got), Ad < Bd)


def test_compare_sparse_result_type():
    """zero-false comparisons of two sparse matrices stay sparse; the
    inefficient (zero-true) ones warn."""
    A, _ = _mk(seed=19)
    B, _ = _mk(seed=20)
    assert st.issparse(A < B)
    with pytest.warns(UserWarning):
        _ = A >= B


def test_compare_ng_shape():
    A, _ = _mk()
    B, _ = _mk(shape=(9, 11), seed=21)
    for name, _np in _OPS:
        with pytest.raises(ValueError):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                _cmp(A, B, name)


def test_eq_none():
    A, _ = _mk()
    assert (A == None) is False  # noqa: E711
    assert (A != None) is True  # noqa: E711


# -- setdiag / getcol --------------------------------------------------------

def test_setdiag_grid():
    """Reference TestCsrMatrixDiagonal.test_setdiag protocol: every k in
    (-m+1, n), diagonal lengths d-1 / d / d+1, vs scipy on the same
    matrix."""
    import scipy.sparse as sp

    m, n = 8, 5
    A0 = st.random(m, n, 0.5, format="csr", random_state=22)
    for k in range(-m + 1, n):
        m_st, n_st = max(0, -k), max(0, k)
        for d in (-1, 0, 1):
            x_len = min(m - m_st, n - n_st) + d
            if x_len <= 0:
                continue
            x = np.linspace(1, 2, x_len).astype(np.float32)
            A = A0.copy()
            S = sp.csr_matrix(A0.to_scipy())
            A.setdiag(x, k=k)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                S.setdiag(x, k=k)
            np.testing.assert_allclose(np.asarray(A.toarray()),
                                       S.toarray(), rtol=1e-6)


def test_setdiag_scalar():
    import scipy.sparse as sp

    m, n = 5, 8
    A = st.random(m, n, 0.4, format="csr", random_state=23)
    S = sp.csr_matrix(A.to_scipy())
    for k in (-2, 0, 3):
        A.setdiag(1.5, k=k)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            S.setdiag(1.5, k=k)
    np.testing.assert_allclose(np.asarray(A.toarray()), S.toarray(),
                               rtol=1e-6)


def test_setdiag_invalid():
    m, n = 6, 4
    A = st.random(m, n, 0.4, format="csr", random_state=24)
    for k in (-m, n):
        with pytest.raises(ValueError):
            A.setdiag(1.0, k=k)


def test_getcol():
    A, Ad = _mk()
    for j in range(A.shape[1]):
        col = A.getcol(j)
        assert col.shape == (A.shape[0], 1)
        np.testing.assert_allclose(np.asarray(col.toarray()).ravel(),
                                   Ad[:, j])
