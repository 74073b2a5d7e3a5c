"""Fixed-structure serving plans (ops/serving.py): preprocess-once
SpGEMM whose structure is a plan constant, values self-deterministic
bitwise and within a few ulp of spgemm(alg=1) (exact parity is not
guaranteed across programs: XLA may reschedule the HIGHEST matmul)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.ops.serving import spgemm_plan


def _pair(m, k, n, da, db, seed):
    A = st.random(m, k, da, format="csr", random_state=seed)
    B = st.random(k, n, db, format="csr", random_state=seed + 1)
    return A, B


def _assert_ulp_close(got, want, max_ulp=16):
    """Float32 arrays equal to within a few ulp (XLA may reschedule the
    HIGHEST split matmul between programs; measured <=6 ulp on v5e)."""
    assert got.shape == want.shape
    ulp = np.abs(got.view(np.int32).astype(np.int64)
                 - want.view(np.int32).astype(np.int64))
    assert int(ulp.max(initial=0)) <= max_ulp, ulp.max()


@pytest.mark.parametrize("m,k,n,da,db", [
    (256, 256, 256, 0.1, 0.1),
    (128, 384, 256, 0.05, 0.02),
    (256, 128, 128, 0.3, 0.3),
])
def test_plan_matches_alg1(m, k, n, da, db):
    A, B = _pair(m, k, n, da, db, seed=m + n)
    plan = spgemm_plan(A, B, interpret=True)
    C = plan(A.data, B.data)
    ref = st.spgemm(A, B, alg=1)
    assert np.array_equal(np.asarray(C.indptr), np.asarray(ref.indptr))
    assert np.array_equal(np.asarray(C.indices), np.asarray(ref.indices))
    _assert_ulp_close(np.asarray(C.data), np.asarray(ref.data))
    # self-determinism IS bitwise (same program, same inputs)
    C2 = plan(A.data, B.data)
    assert (np.asarray(C.data).tobytes()
            == np.asarray(C2.data).tobytes())


def test_plan_routed_on_interpret():
    A, B = _pair(256, 256, 256, 0.1, 0.1, seed=3)
    plan = spgemm_plan(A, B, interpret=True)
    # at these shapes/densities every stage should route
    assert plan.routed == (True, True, True)


def test_plan_fallback_matches():
    A, B = _pair(256, 256, 256, 0.1, 0.1, seed=5)
    routed = spgemm_plan(A, B, interpret=True)
    fallback = spgemm_plan(A, B, use_routed=False)
    Cr = routed(A.data, B.data)
    Cf = fallback(A.data, B.data)
    _assert_ulp_close(np.asarray(Cr.data), np.asarray(Cf.data))
    assert np.array_equal(np.asarray(Cr.indices), np.asarray(Cf.indices))


def test_plan_new_values_same_structure():
    A, B = _pair(256, 256, 256, 0.08, 0.08, seed=9)
    plan = spgemm_plan(A, B, interpret=True)
    rng = np.random.default_rng(0)
    for _ in range(3):
        a_vals = jnp.asarray(
            rng.standard_normal(plan.nnz_a).astype(np.float32))
        b_vals = jnp.asarray(
            rng.standard_normal(plan.nnz_b).astype(np.float32))
        C = plan(a_vals, b_vals)
        A2 = st.CSR.from_parts(A.indptr, A.indices, a_vals, A.shape,
                               canonical=True)
        B2 = st.CSR.from_parts(B.indptr, B.indices, b_vals, B.shape,
                               canonical=True)
        ref = st.spgemm(A2, B2, alg=1)
        _assert_ulp_close(np.asarray(C.data), np.asarray(ref.data))
        # structure is shared, not recomputed
        assert C.indptr is plan.indptr
        assert C.indices is plan.indices


def test_plan_alpha():
    A, B = _pair(128, 128, 128, 0.2, 0.2, seed=21)
    plan = spgemm_plan(A, B, interpret=True)
    C = plan(A.data, B.data, alpha=2.5)
    ref = st.spgemm(A, B, alpha=2.5, alg=1)
    _assert_ulp_close(np.asarray(C.data), np.asarray(ref.data))


def test_plan_explicit_zero_and_tiny_values():
    # static structure: no _TINY marker — values equal to the marker and
    # explicit zeros travel exactly, structure keeps structural zeros
    A, B = _pair(128, 128, 128, 0.1, 0.1, seed=33)
    data = np.asarray(A.data).copy()
    data[0] = 0.0
    data[1] = np.float32(1.1754944e-38)
    A = st.CSR.from_parts(A.indptr, A.indices, jnp.asarray(data), A.shape,
                          canonical=True)
    plan = spgemm_plan(A, B, interpret=True)
    C = plan(A.data, B.data)
    Sa = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                        np.asarray(A.indptr)), shape=A.shape)
    Sb = sp.csr_matrix((np.asarray(B.data), np.asarray(B.indices),
                        np.asarray(B.indptr)), shape=B.shape)
    pat = ((Sa != 0).astype(np.float64) + (np.asarray(A.data) == 0).sum()
           * 0)  # structural pattern includes explicit zeros
    # structural product via ones on the stored entries
    Pa = sp.csr_matrix((np.ones(A.nnz), np.asarray(A.indices),
                        np.asarray(A.indptr)), shape=A.shape)
    Pb = sp.csr_matrix((np.ones(B.nnz), np.asarray(B.indices),
                        np.asarray(B.indptr)), shape=B.shape)
    Sp = (Pa @ Pb).tocsr()
    Sp.sort_indices()
    assert np.array_equal(np.asarray(C.indptr), Sp.indptr)
    assert np.array_equal(np.asarray(C.indices), Sp.indices)
    ref = (Sa.toarray() @ Sb.toarray())
    rows = np.repeat(np.arange(128), np.diff(Sp.indptr))
    got = np.asarray(C.data)
    want = ref[rows, Sp.indices]
    assert np.allclose(got, want, rtol=1e-6, atol=1e-7)


def test_plan_empty_output():
    # A's columns and B's rows never meet -> empty product
    A = st.CSR.from_parts(
        jnp.asarray(np.arange(129, dtype=np.int32)),
        jnp.zeros((128,), jnp.int32),
        jnp.ones((128,), jnp.float32), (128, 128), canonical=True)
    bi = np.zeros((129,), np.int32)
    bi[100:] = 1
    B = st.CSR.from_parts(jnp.asarray(bi), jnp.asarray([5], jnp.int32),
                          jnp.ones((1,), jnp.float32), (128, 128),
                          canonical=True)
    # A stores column 0 only; B stores row 99 only -> no overlap
    plan = spgemm_plan(A, B, interpret=True)
    assert plan.nnz == 0
    C = plan(A.data, B.data)
    assert C.nnz == 0


def test_plan_validates_value_sizes():
    A, B = _pair(128, 128, 128, 0.1, 0.1, seed=41)
    plan = spgemm_plan(A, B, interpret=True)
    with pytest.raises(ValueError, match="do not match"):
        plan(A.data[:-1], B.data)


def test_plan_values_batch():
    """K stacked value sets in one program == K sequential calls,
    bitwise (same program body per step)."""
    A, B = _pair(192, 192, 192, 0.1, 0.1, seed=5)
    plan = spgemm_plan(A, B, interpret=True)
    rng = np.random.default_rng(0)
    K = 3
    a_vals = jnp.asarray(rng.random((K, plan.nnz_a), dtype=np.float32))
    b_vals = jnp.asarray(rng.random((K, plan.nnz_b), dtype=np.float32))
    batch = np.asarray(plan.values_batch(a_vals, b_vals, alpha=2.0))
    for i in range(K):
        one = np.asarray(plan.values(a_vals[i], b_vals[i], alpha=2.0))
        _assert_ulp_close(batch[i], one)


def test_plan_values_batch_alpha_vector():
    A, B = _pair(128, 128, 128, 0.1, 0.1, seed=9)
    plan = spgemm_plan(A, B, interpret=True)
    a_vals = jnp.stack([A.data, 2 * A.data])
    b_vals = jnp.stack([B.data, B.data])
    batch = np.asarray(plan.values_batch(
        a_vals, b_vals, alpha=jnp.asarray([1.0, 0.5], jnp.float32)))
    base = np.asarray(plan.values(A.data, B.data))
    _assert_ulp_close(batch[0], base)
    _assert_ulp_close(batch[1], base)  # 0.5 * (2A)@B == A@B


def test_plan_values_batch_validates():
    A, B = _pair(64, 64, 64, 0.1, 0.1, seed=11)
    plan = spgemm_plan(A, B, interpret=True)
    with pytest.raises(ValueError):
        plan.values_batch(A.data, jnp.stack([B.data]))
    with pytest.raises(ValueError):
        plan.values_batch(jnp.stack([A.data]),
                          jnp.stack([B.data, B.data]))
    with pytest.raises(ValueError):
        plan.values_batch(jnp.stack([A.data[:-1]]), jnp.stack([B.data]))


def test_plan_values_accumulate():
    """beta*C + alpha*A@B with the C buffer donated (workspace reuse)."""
    A, B = _pair(160, 160, 160, 0.1, 0.1, seed=7)
    plan = spgemm_plan(A, B, interpret=True)
    base = np.asarray(plan.values(A.data, B.data))
    c = jnp.zeros((plan.nnz,), jnp.float32)
    c = plan.values_accumulate(c, A.data, B.data)          # C = A@B
    c = plan.values_accumulate(c, A.data, B.data, alpha=1.0, beta=1.0)
    got = np.asarray(c)
    _assert_ulp_close(got, (2.0 * base).astype(np.float32))
    c2 = plan.values_accumulate(jnp.asarray(base), A.data, B.data,
                                alpha=-1.0, beta=1.0)      # C - A@B
    assert np.max(np.abs(np.asarray(c2))) <= 1e-7 * np.max(np.abs(base))
    with pytest.raises(ValueError):
        plan.values_accumulate(jnp.zeros((plan.nnz + 1,), jnp.float32),
                               A.data, B.data)
