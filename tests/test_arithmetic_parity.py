"""Randomized arithmetic parity vs scipy across formats and op
combinations — the breadth layer of the reference's container suites
(test_csr/test_csc/test_coo arithmetic classes).
"""

import numpy as np
import pytest
import scipy.sparse as sp

import spmm_tpu as st
from spmm_tpu.sparse import construct

FMT = ["csr", "csc", "coo"]


def _pair(seed, m=17, n=23, d=0.3):
    rng = np.random.default_rng(seed)
    A = np.where(rng.random((m, n)) < d, rng.standard_normal((m, n)), 0.0)
    B = np.where(rng.random((m, n)) < d, rng.standard_normal((m, n)), 0.0)
    return A.astype(np.float32), B.astype(np.float32)


def _mk(arr, fmt):
    return st.CSR(arr).asformat(fmt)


@pytest.mark.parametrize("fmt", FMT)
def test_add_sub_sparse(fmt):
    Ad, Bd = _pair(0)
    A, B = _mk(Ad, fmt), _mk(Bd, fmt)
    np.testing.assert_allclose(np.asarray((A + B).toarray()), Ad + Bd,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray((A - B).toarray()), Ad - Bd,
                               rtol=1e-6)


@pytest.mark.parametrize("fmt", FMT)
def test_add_dense(fmt):
    Ad, Bd = _pair(1)
    A = _mk(Ad, fmt)
    got = A + Bd  # dense result, scipy semantics
    np.testing.assert_allclose(np.asarray(got), Ad + Bd, rtol=1e-6)
    got = A - Bd
    np.testing.assert_allclose(np.asarray(got), Ad - Bd, rtol=1e-6)


@pytest.mark.parametrize("fmt", FMT)
def test_multiply_elementwise(fmt):
    Ad, Bd = _pair(2)
    A, B = _mk(Ad, fmt), _mk(Bd, fmt)
    np.testing.assert_allclose(np.asarray(A.multiply(B).toarray()),
                               Ad * Bd, rtol=1e-6)
    # dense rhs
    np.testing.assert_allclose(np.asarray(A.multiply(Bd).toarray()),
                               Ad * Bd, rtol=1e-6)


@pytest.mark.parametrize("fmt", FMT)
@pytest.mark.parametrize("axis", ["row", "col"])
def test_multiply_broadcast(fmt, axis):
    Ad, _ = _pair(3)
    A = _mk(Ad, fmt)
    v = np.random.default_rng(7).standard_normal(
        (1, Ad.shape[1]) if axis == "row" else (Ad.shape[0], 1)
    ).astype(np.float32)
    got = A.multiply(v)
    np.testing.assert_allclose(np.asarray(got.toarray()), Ad * v,
                               rtol=1e-6)


def test_scalar_ops_matrix():
    Ad, _ = _pair(4)
    A = st.CSR(Ad)
    S = sp.csr_matrix(Ad)
    for got, want in [
        (A * 2.5, S * 2.5), (2.5 * A, 2.5 * S), (A / 2.0, S / 2.0),
        (-A, -S), (A * np.float32(3), S * np.float32(3)),
    ]:
        np.testing.assert_allclose(np.asarray(got.toarray()),
                                   want.toarray(), rtol=1e-6)


def test_power_matches_scipy():
    Ad, _ = _pair(5)
    A = st.CSR(Ad)
    S = sp.csr_matrix(Ad)
    np.testing.assert_allclose(np.asarray(A.power(2).toarray()),
                               S.power(2).toarray(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.power(3).toarray()),
                               S.power(3).toarray(), rtol=1e-5)


@pytest.mark.parametrize("fmt", FMT)
def test_sum_mean_axes(fmt):
    Ad, _ = _pair(6)
    A = _mk(Ad, fmt)
    S = sp.csr_matrix(Ad)
    np.testing.assert_allclose(float(A.sum()), S.sum(), rtol=1e-5)
    for axis in (0, 1, -1, -2):
        np.testing.assert_allclose(
            np.asarray(A.sum(axis=axis)).ravel(),
            np.asarray(S.sum(axis=axis)).ravel(), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(A.mean(axis=axis)).ravel(),
            np.asarray(S.mean(axis=axis)).ravel(), rtol=1e-5)


@pytest.mark.parametrize("fmt", FMT)
def test_matvec_matmat_parity(fmt):
    Ad, _ = _pair(8)
    A = _mk(Ad, fmt)
    x = np.random.default_rng(9).standard_normal(Ad.shape[1]).astype(
        np.float32)
    X = np.random.default_rng(10).standard_normal(
        (Ad.shape[1], 5)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(A @ x), Ad @ x, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(A @ X), Ad @ X, rtol=1e-4,
                               atol=1e-5)


def test_transpose_conj_combo():
    rng = np.random.default_rng(11)
    Ad = (rng.standard_normal((9, 13)) + 1j * rng.standard_normal((9, 13))
          ).astype(np.complex64) * (rng.random((9, 13)) < 0.4)
    A = st.CSR(Ad)
    np.testing.assert_allclose(np.asarray(A.T.toarray()), Ad.T, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.conj().toarray()), Ad.conj(),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.real.toarray()), Ad.real,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.imag.toarray()), Ad.imag,
                               rtol=1e-6)


@pytest.mark.parametrize("fmt", FMT)
def test_abs_sign_roundtrip(fmt):
    Ad, _ = _pair(12)
    A = _mk(Ad, fmt)
    np.testing.assert_allclose(np.asarray(abs(A).toarray()), np.abs(Ad),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(A.sign().toarray()),
                               np.sign(Ad), rtol=1e-6)


def test_mixed_format_add():
    Ad, Bd = _pair(13)
    got = st.CSR(Ad) + st.CSR(Bd).tocsc()
    np.testing.assert_allclose(np.asarray(got.toarray()), Ad + Bd,
                               rtol=1e-6)
