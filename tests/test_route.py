"""Routed monotone data-movement kernels (ops/kernels/route.py):
CSR -> dense expansion and dense -> CSR extraction with static plans,
checked bitwise against direct dense construction (interpret mode)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.ops.kernels.route import (
    expand_route_plan, densify_routed,
    compress_route_plan, extract_routed)


def _rand_csr(m, n, density, seed, explicit_zero=False):
    A = st.random(m, n, density, format="csr", random_state=seed)
    if explicit_zero and A.nnz:
        data = np.asarray(A.data).copy()
        data[0] = 0.0
        A = st.CSR.from_parts(A.indptr, A.indices, jnp.asarray(data),
                              A.shape, canonical=True)
    return A


@pytest.mark.parametrize("m,n,density", [
    (256, 256, 0.1),
    (128, 384, 0.02),
    (384, 128, 0.5),
    (256, 128, 0.003),
    (128, 128, 1.0),
])
def test_expand_bitwise(m, n, density):
    A = _rand_csr(m, n, density, seed=m + int(density * 1000))
    plan = expand_route_plan(np.asarray(A.indptr), np.asarray(A.indices),
                             m, n)
    assert plan is not None
    dense, pattern = densify_routed(A.data, plan, interpret=True)
    S = sp.csr_matrix(
        (np.asarray(A.data), np.asarray(A.indices), np.asarray(A.indptr)),
        shape=(m, n))
    ref = S.toarray()
    assert np.array_equal(np.asarray(dense), ref)
    # structural pattern: 1 exactly where an entry is stored
    pat_ref = np.zeros((m, n), bool)
    pat_ref[S.nonzero()] = True  # nonzero drops explicit zeros
    # rebuild structural pattern including explicit zeros
    pat_ref = np.zeros((m, n), bool)
    rows = np.repeat(np.arange(m), np.diff(np.asarray(A.indptr)))
    pat_ref[rows, np.asarray(A.indices)] = True
    assert np.array_equal(np.asarray(pattern) != 0, pat_ref)


def test_expand_explicit_zero_stays_structural():
    A = _rand_csr(128, 128, 0.05, seed=7, explicit_zero=True)
    plan = expand_route_plan(np.asarray(A.indptr), np.asarray(A.indices),
                             128, 128)
    dense, pattern = densify_routed(A.data, plan, interpret=True)
    rows = np.repeat(np.arange(128), np.diff(np.asarray(A.indptr)))
    cols = np.asarray(A.indices)
    assert float(dense[rows[0], cols[0]]) == 0.0
    assert float(pattern[rows[0], cols[0]]) == 1.0


def test_expand_value_bits_preserved():
    # denormals / negative zero travel bitwise
    A = _rand_csr(128, 128, 0.03, seed=3)
    data = np.asarray(A.data).copy()
    data[1] = -0.0
    data[2] = np.float32(1.1754944e-38)  # would collide with _TINY marker
    A = st.CSR.from_parts(A.indptr, A.indices, jnp.asarray(data),
                          A.shape, canonical=True)
    plan = expand_route_plan(np.asarray(A.indptr), np.asarray(A.indices),
                             128, 128)
    dense, _ = densify_routed(A.data, plan, interpret=True)
    rows = np.repeat(np.arange(128), np.diff(np.asarray(A.indptr)))
    cols = np.asarray(A.indices)
    got = np.asarray(dense)[rows, cols]
    assert got.tobytes() == data.tobytes()


@pytest.mark.parametrize("m,n,density", [
    (256, 256, 0.9),
    (256, 256, 0.3),
    (128, 384, 0.05),
    (128, 128, 1.0),
    (384, 128, 0.2),
])
def test_compress_bitwise(m, n, density):
    rng = np.random.default_rng(m + int(density * 100))
    mask = rng.random((m, n)) < density
    if not mask.any():
        mask[0, 0] = True
    c = rng.standard_normal((m, n)).astype(np.float32)
    plan = compress_route_plan(mask, n)
    assert plan is not None
    vals = extract_routed(jnp.asarray(c), plan, interpret=True)
    ref = c[mask]
    assert np.array_equal(np.asarray(vals), ref)
    # static structure arrays match scipy
    S = sp.csr_matrix(mask)
    assert np.array_equal(np.asarray(plan.indptr), S.indptr)
    assert np.array_equal(np.asarray(plan.indices), S.indices)


def test_compress_empty_rows_and_tail():
    rng = np.random.default_rng(0)
    mask = np.zeros((256, 256), bool)
    mask[3, :] = True
    mask[10, :] = True
    mask[60, 250] = True
    c = rng.standard_normal((256, 256)).astype(np.float32)
    plan = compress_route_plan(mask, 256)
    assert plan is not None
    vals = extract_routed(jnp.asarray(c), plan, interpret=True)
    assert np.array_equal(np.asarray(vals), c[mask])


def test_compress_ultra_sparse_returns_none():
    # A dest block spanning a >128-source-row window cannot be routed
    # with the resident 128-row slice: the builder reports the gate
    # (callers fall back to a static-index gather).
    mask = np.zeros((256, 256), bool)
    mask[3, 250] = True
    mask[200, :] = True
    assert compress_route_plan(mask, 256) is None
    rng = np.random.default_rng(1)
    sparse_mask = rng.random((384, 128)) < 0.001
    sparse_mask[0, 0] = sparse_mask[-1, -1] = True
    assert compress_route_plan(sparse_mask, 128) is None


def test_roundtrip_spgemm_shapes():
    # expansion then compression reproduces the serving pipeline movement
    m = k = n = 256
    A = _rand_csr(m, k, 0.1, seed=11)
    B = _rand_csr(k, n, 0.1, seed=12)
    pa = expand_route_plan(np.asarray(A.indptr), np.asarray(A.indices), m, k)
    pb = expand_route_plan(np.asarray(B.indptr), np.asarray(B.indices), k, n)
    da, pata = densify_routed(A.data, pa, interpret=True)
    db, patb = densify_routed(B.data, pb, interpret=True)
    Sa = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                        np.asarray(A.indptr)), shape=(m, k))
    Sb = sp.csr_matrix((np.asarray(B.data), np.asarray(B.indices),
                        np.asarray(B.indptr)), shape=(k, n))
    cref = (Sa.toarray().astype(np.float64)
            @ Sb.toarray().astype(np.float64))
    counts = (Sa.toarray() != 0).astype(np.float64) @ (
        Sb.toarray() != 0).astype(np.float64)
    mask = counts > 0
    c = np.asarray(da, np.float64) @ np.asarray(db, np.float64)
    pc = compress_route_plan(mask, n)
    vals = extract_routed(jnp.asarray(c.astype(np.float32)), pc,
                          interpret=True)
    assert np.allclose(np.asarray(vals),
                       cref[mask].astype(np.float32), rtol=1e-5, atol=1e-6)
