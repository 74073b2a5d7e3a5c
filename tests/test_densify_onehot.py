"""Windowed one-hot MXU densify kernel (kernels/densify_onehot) — CPU
interpret-mode correctness: bitwise value equality with the reference
scatter densify, structural-pattern fidelity (explicit zeros kept), plan
applicability boundaries.  On TPU the same kernel is the alg1 hot path
(wired through `alg1_onehot_plans`)."""

import numpy as np
import jax.numpy as jnp
import pytest

import spmm_tpu as st
from spmm_tpu.ops.kernels.densify_onehot import (densify_onehot,
                                                 densify_onehot_plan)


@pytest.mark.parametrize(
    "m,k,density,seed",
    [(64, 128, 0.1, 0), (100, 300, 0.05, 1), (256, 256, 0.3, 2),
     (8, 1024, 0.5, 3), (33, 136, 0.2, 4)])
def test_densify_onehot_bitwise(m, k, density, seed):
    A = st.random(m, k, density, format="csr", random_state=seed)
    plan = densify_onehot_plan(np.asarray(A.indptr), m, k, ch=256)
    assert plan is not None
    val, pat = densify_onehot(A.indptr, A.indices, A.data, m, k, plan,
                              interpret=True)
    ref = np.asarray(A.toarray())
    assert np.array_equal(np.asarray(val), ref)
    assert np.array_equal(np.asarray(pat, np.float32) != 0, ref != 0)


def test_densify_onehot_explicit_zero_pattern():
    # a stored zero must appear in the pattern but not the values
    indptr = np.array([0, 2, 3], np.int32)
    indices = np.array([1, 40, 7], np.int32)
    data = np.array([0.0, 2.5, -1.0], np.float32)
    A = st.CSR.from_parts(indptr, indices, data, (2, 64), canonical=True)
    plan = densify_onehot_plan(indptr, 2, 64, ch=256)
    val, pat = densify_onehot(A.indptr, A.indices, A.data, 2, 64, plan,
                              interpret=True)
    assert float(val[0, 1]) == 0.0
    assert float(pat[0, 1]) == 1.0
    assert float(val[0, 40]) == 2.5
    assert float(pat[1, 7]) == 1.0
    assert float(jnp.sum(pat)) == 3.0


def test_densify_onehot_plan_boundaries():
    # empty matrix -> no plan
    A = st.CSR((5, 7), dtype=jnp.float32)
    assert densify_onehot_plan(np.asarray(A.indptr), 5, 7) is None
    # one chunk spanning too many rows (ultra-sparse) -> no plan
    m = 100000
    indptr = np.zeros(m + 1, np.int32)
    indptr[1:] = np.cumsum(np.zeros(m, np.int32))
    indptr[-1] = 1  # single entry in the last row
    indptr[:-1] = 0
    assert densify_onehot_plan(indptr, m, 128, ch=1024, w_max=64) is None


def test_densify_onehot_values_with_wide_range():
    # exact bf16x3 reconstruction across magnitudes
    rng = np.random.default_rng(0)
    m, k = 32, 256
    A = st.random(m, k, 0.2, format="csr", random_state=9)
    data = (rng.random(A.nnz).astype(np.float32) * 1e4
            - 5e3).astype(np.float32)
    A = st.CSR.from_parts(A.indptr, A.indices, jnp.asarray(data), (m, k),
                          canonical=True)
    plan = densify_onehot_plan(np.asarray(A.indptr), m, k, ch=128)
    val, _ = densify_onehot(A.indptr, A.indices, A.data, m, k, plan,
                            interpret=True)
    assert np.array_equal(np.asarray(val), np.asarray(A.toarray()))


def test_densify_onehot_value_only_bitwise():
    """with_pattern=False must reproduce the value output bitwise (same
    MXU passes, pattern pass dropped)."""
    import numpy as np
    import spmm_tpu as st
    from spmm_tpu.ops.kernels.densify_onehot import (densify_onehot,
                                                     densify_onehot_plan)

    a = st.random(300, 260, 0.15, format="csr", random_state=12)
    plan = densify_onehot_plan(np.asarray(a.indptr), 300, 260)
    assert plan is not None
    v1, p1 = densify_onehot(a.indptr, a.indices, a.data, 300, 260, plan,
                            interpret=True)
    v2, p2 = densify_onehot(a.indptr, a.indices, a.data, 300, 260, plan,
                            interpret=True, with_pattern=False)
    assert p2 is None and p1 is not None
    assert np.array_equal(np.asarray(v1).view(np.uint32),
                          np.asarray(v2).view(np.uint32))


@pytest.mark.parametrize(
    "m,k,density,seed",
    [(64, 128, 0.1, 0), (100, 300, 0.05, 1), (256, 256, 0.3, 2),
     (33, 136, 0.2, 4)])
def test_densify_onehot_pattern_only(m, k, density, seed):
    from spmm_tpu.ops.kernels.densify_onehot import densify_onehot_pattern

    A = st.random(m, k, density, format="csr", random_state=seed)
    plan = densify_onehot_plan(np.asarray(A.indptr), m, k, ch=256,
                               out_bytes_per_cell=2)
    assert plan is not None
    pat = densify_onehot_pattern(A.indptr, A.indices, m, k, plan,
                                 interpret=True)
    assert pat.dtype == jnp.bfloat16
    ref = np.asarray(A.toarray()) != 0
    # structural 0/1, exactly (canonical CSR: one entry per cell)
    assert np.array_equal(np.asarray(pat, np.float32), ref.astype(np.float32))


def test_densify_onehot_pattern_keeps_explicit_zeros():
    from spmm_tpu.ops.kernels.densify_onehot import densify_onehot_pattern

    indptr = np.array([0, 2, 3], np.int32)
    indices = np.array([1, 5, 0], np.int32)
    data = np.array([0.0, 2.0, -1.0], np.float32)
    plan = densify_onehot_plan(indptr, 2, 8, ch=256,
                               out_bytes_per_cell=2)
    pat = densify_onehot_pattern(jnp.asarray(indptr), jnp.asarray(indices),
                                 2, 8, plan, interpret=True)
    want = np.zeros((2, 8), np.float32)
    want[0, 1] = want[0, 5] = want[1, 0] = 1.0  # explicit zero kept
    assert np.array_equal(np.asarray(pat, np.float32), want)


def test_plan_bytes_per_cell_gate():
    # a shape feasible at 2 B/cell but not at 6 B/cell exercises the
    # mode-keyed VMEM gate (the r5b 2048^2 wall)
    m = k = 2048
    rng = np.random.default_rng(0)
    rowc = np.full(m, 409)
    indptr = np.concatenate([[0], np.cumsum(rowc)]).astype(np.int64)
    p2 = densify_onehot_plan(indptr, m, k, out_bytes_per_cell=2)
    p6 = densify_onehot_plan(indptr, m, k, out_bytes_per_cell=6)
    assert p2 is not None
    assert p6 is not None  # 25.2 MB <= 28 MB budget (raised r5b)
    m = k = 4096
    indptr4 = (np.arange(m + 1) * 41).astype(np.int64)
    # 4096^2 exceeds the budget at every mode (33.5 MB even at 2 B/cell)
    assert densify_onehot_plan(indptr4, m, k, out_bytes_per_cell=4) is None
    assert densify_onehot_plan(indptr4, m, k, out_bytes_per_cell=2) is None
