"""Routed SpMV (kernels/spmv_routed): SciPy parity in interpret mode,
edge-coloring validity, determinism, and plan edge cases."""

import numpy as np
import pytest

import jax.numpy as jnp

import spmm_tpu as st
from spmm_tpu.ops.kernels.spmv_routed import (spmv_routed,
                                              spmv_routed_plan)


def _scipy(a):
    from scipy import sparse as sp

    return sp.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                          np.asarray(a.indptr)), shape=a.shape)


def _plan(a, stack_override=None):
    m, n = a.shape
    return spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), m, n,
                            stack_override=stack_override)


@pytest.mark.parametrize("m,n,dens,seed", [
    (300, 256, 0.05, 0),
    (1000, 1000, 0.01, 1),
    (130, 1000, 0.002, 2),
    (64, 64, 0.3, 4),
    (129, 200, 0.08, 5),      # ragged group tail
    (256, 20000, 0.01, 3),    # n > 16384: multi-tile gather
])
def test_spmv_routed_scipy_parity(m, n, dens, seed):
    a = st.random(m, n, dens, format="csr", random_state=seed)
    x = np.random.default_rng(seed + 9).standard_normal(n).astype(
        np.float32)
    plan = _plan(a)
    assert plan is not None
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    ref = _scipy(a) @ x
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(y, ref, atol=4e-7 * scale)


def test_spmv_routed_tables_are_valid_coloring():
    """Every entry lands at a unique (lane-row, sublane) gather slot and
    a unique (lane-row, rho) value slot — the plan invariants the
    kernels rely on.  Values live in routed layout (0.0 = dead), so a
    coloring collision would overwrite a slot and break the sums."""
    a = st.random(700, 600, 0.03, format="csr", random_state=8)
    plan = _plan(a)
    assert plan is not None
    vals = np.asarray(plan.val_tbl)
    data = np.asarray(a.data)
    # with generic random data every value is nonzero, so slot count and
    # total must survive the placement exactly
    assert int((vals != 0).sum()) == a.nnz
    np.testing.assert_allclose(vals.sum(dtype=np.float64),
                               data.sum(dtype=np.float64), rtol=1e-6)
    # hi table dtype narrows with the x-tile count (6-7 B/slot stream)
    assert np.asarray(plan.hi_tbl).dtype == (np.int8 if plan.C == 1
                                             else np.int16)


def test_spmv_routed_deterministic():
    a = st.random(500, 500, 0.02, format="csr", random_state=11)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(500)
                    .astype(np.float32))
    plan = _plan(a)
    y1 = np.asarray(spmv_routed(x, plan, interpret=True))
    y2 = np.asarray(spmv_routed(x, plan, interpret=True))
    assert np.array_equal(y1.view(np.uint32), y2.view(np.uint32))


def test_spmv_routed_plan_rejects_huge_n():
    a = st.random(64, 140000, 0.0005, format="csr", random_state=2)
    assert _plan(a) is None


def test_spmv_routed_empty():
    a = st.random(64, 64, 0.0, format="csr", random_state=2)
    assert _plan(a) is None


def _boundary_plan_case(lo_scale, hi_scale, seed=0):
    """256 rows (two 128-row groups) x 4 entries each: L_g is tiny, so
    both groups share one 128-lane-row tile and the plan takes the
    boundary-split (nseg=2) path.  Group 0 rows carry `hi_scale`
    magnitudes, group 1 rows `lo_scale`."""
    rng = np.random.default_rng(seed)
    m = n = 256
    deg = 4
    cols = np.stack([np.sort(rng.choice(n, deg, replace=False))
                     for _ in range(m)])
    scale = np.where(np.arange(m) < 128, hi_scale, lo_scale)
    data = (rng.uniform(0.5, 1.0, (m, deg)) * scale[:, None]).astype(
        np.float32)
    indptr = np.arange(0, m * deg + 1, deg, dtype=np.int64)
    x = rng.standard_normal(n).astype(np.float32)
    # stack_override=1: these cases exercise the S=1 seg2/fallback
    # kernels specifically; the r5 padded-slot cost model otherwise
    # (correctly) prefers a stacked plan at this tiny NL, whose matsum
    # reduce never takes the seg path
    plan = spmv_routed_plan(indptr, cols.ravel(), data.ravel(), m, n,
                            stack_override=1)
    return plan, indptr, cols.ravel(), data.ravel(), x, m, n


def test_spmv_routed_seg2_scale_disparate_boundary():
    """Regression for the seg2 cancellation bug: segment 2 computed as
    (full-tile sum - prefix sum) loses ALL precision on the small-scale
    group when the groups sharing a boundary tile differ by ~1e12 in
    magnitude.  The kernel must use a direct suffix-masked sum."""
    from scipy import sparse as sp

    plan, indptr, idx, dat, x, m, n = _boundary_plan_case(1e-4, 1e8)
    assert plan is not None and plan.nseg == 2
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    ref64 = sp.csr_matrix(
        (dat.astype(np.float64), idx, indptr), shape=(m, n)) @ \
        x.astype(np.float64)
    # per-row relative error: the 1e-4-scale rows must keep f32-sum
    # accuracy despite sharing a tile with 1e8-scale rows
    np.testing.assert_allclose(y, ref64, rtol=1e-5, atol=0.0)


def test_spmv_routed_seg2_matches_fallback_kernel():
    """nseg=2 and forced nseg=0 over the SAME plan tables must both sit
    within the f32 fixed-order-sum error bound of the float64 reference
    (different reduction trees, so not bitwise; the tolerance scales
    with the row's ABSOLUTE magnitude Σ|a_ij x_j| — scaling by the
    output would blow up on rows with cancellation)."""
    from scipy import sparse as sp

    plan, indptr, idx, dat, x, m, n = _boundary_plan_case(1.0, 1e8,
                                                          seed=3)
    assert plan is not None and plan.nseg == 2
    y_seg = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    plan0 = plan._replace(seg_tbl=None, nseg=0)
    y0 = np.asarray(spmv_routed(jnp.asarray(x), plan0, interpret=True))
    A64 = sp.csr_matrix((dat.astype(np.float64), idx, indptr),
                        shape=(m, n))
    ref = A64 @ x.astype(np.float64)
    rowabs = abs(A64) @ np.abs(x.astype(np.float64)) + 1e-30
    assert np.max(np.abs(y_seg - ref) / rowabs) < 4e-7
    assert np.max(np.abs(y0 - ref) / rowabs) < 4e-7


@pytest.mark.parametrize("mode", ["matsum", "fallback"])
def test_spmv_routed_mode_parity(mode):
    """The explicit reduce-kernel selectors (matsum = dense sub-block
    sums + one-hot MXU group accumulation, fallback = legacy masked
    per-sub-block updates) must agree with SciPy within the f32
    fixed-order bound on an nseg=0 plan — the small-plan regime where
    `mode="auto"` picks matsum."""
    from scipy import sparse as sp

    a = st.random(700, 900, 0.004, format="csr", random_state=11)
    # the explicit seg/fallback selectors exist only for unstacked
    # plans (stacked plans always reduce via matsum), so pin S=1
    plan = _plan(a, stack_override=1)
    assert plan is not None
    plan = plan._replace(seg_tbl=None, nseg=0)
    x = np.random.default_rng(7).standard_normal(900).astype(np.float32)
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True,
                               mode=mode))
    A64 = sp.csr_matrix((np.asarray(a.data, np.float64),
                         np.asarray(a.indices), np.asarray(a.indptr)),
                        shape=a.shape)
    ref = A64 @ x.astype(np.float64)
    rowabs = abs(A64) @ np.abs(x.astype(np.float64)) + 1e-30
    assert np.max(np.abs(y - ref) / rowabs) < 4e-7


def test_spmv_routed_matsum_deterministic():
    """matsum's one-hot matmul accumulation is a fixed tree: bitwise
    reproducible across calls."""
    a = st.random(500, 500, 0.01, format="csr", random_state=12)
    plan = _plan(a)._replace(seg_tbl=None, nseg=0)
    x = jnp.asarray(np.random.default_rng(8).standard_normal(500)
                    .astype(np.float32))
    y1 = np.asarray(spmv_routed(x, plan, interpret=True, mode="matsum"))
    y2 = np.asarray(spmv_routed(x, plan, interpret=True, mode="matsum"))
    assert np.array_equal(y1, y2)


def test_spmm_routed_matsum_scipy_parity():
    """The SpMM matsum path (nseg=0 plans under the one-hot budget) must
    match SciPy for multi-vector execution."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    a = st.random(300, 260, 0.04, format="csr", random_state=6)
    plan = _plan(a)._replace(seg_tbl=None, nseg=0)
    X = np.random.default_rng(3).standard_normal((260, 17)).astype(
        np.float32)
    Y = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    ref = _scipy(a) @ X
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(Y, ref, atol=4e-7 * scale)


def test_spmm_routed_scipy_parity():
    """Multi-vector execution over the same plan (cuSPARSE SpMM
    analogue, cusparse.py:1440-1514)."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    a = st.random(300, 260, 0.04, format="csr", random_state=6)
    plan = _plan(a)
    X = np.random.default_rng(2).standard_normal((260, 13)).astype(
        np.float32)
    Y = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    ref = _scipy(a) @ X
    scale = max(np.abs(ref).max(), 1e-30)
    np.testing.assert_allclose(Y, ref, atol=4e-7 * scale)


def test_spmm_routed_fused_matches_two_kernel():
    """seg2 plans take the fused one-kernel SpMM (no z intermediate);
    its output must sit within the f32 fixed-order bound of float64 and
    agree with the two-kernel fallback to sum accuracy."""
    from scipy import sparse as sp

    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    plan, indptr, idx, dat, x, m, n = _boundary_plan_case(1.0, 1e4,
                                                          seed=5)
    assert plan.nseg == 2
    X = np.random.default_rng(8).standard_normal((n, 13)).astype(
        np.float32)
    Yf = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    Y2 = np.asarray(spmm_routed(
        jnp.asarray(X), plan._replace(seg_tbl=None, nseg=0),
        interpret=True))
    A64 = sp.csr_matrix((dat.astype(np.float64), idx, indptr),
                        shape=(m, n))
    ref = A64 @ X.astype(np.float64)
    rowabs = np.asarray(abs(A64) @ np.abs(X.astype(np.float64))) + 1e-30
    assert np.max(np.abs(Yf - ref) / rowabs) < 4e-7
    assert np.max(np.abs(Y2 - ref) / rowabs) < 4e-7


def test_spmm_plan_dispatch():
    """ops.spmm honors a routed plan tuple (CPU: plan is None, but the
    code path with an explicit interpret-built plan must agree)."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    a = st.random(120, 90, 0.06, format="csr", random_state=3)
    plan = ("routed", _plan(a))
    X = np.random.default_rng(5).standard_normal((90, 4)).astype(
        np.float32)
    # direct kernel in interpret mode == scipy; the spmm wrapper uses
    # the compiled path, so compare wrapper vs kernel only on TPU
    Yk = np.asarray(spmm_routed(jnp.asarray(X), plan[1], interpret=True))
    ref = _scipy(a) @ X
    np.testing.assert_allclose(Yk, ref, atol=4e-7 * max(np.abs(ref).max(),
                                                        1e-30))


def test_spmv_routed_large_parity():
    """Large plan (>=128k nnz) through the padded seg path: parity vs
    scipy for both the boundary-split and forced per-sub-block
    kernels over the same tables."""
    m, n = 2000, 2000
    a = st.random(m, n, 0.034, format="csr", random_state=21)
    assert a.nnz >= (1 << 17)
    plan = _plan(a)
    assert plan is not None
    x = np.random.default_rng(2).standard_normal(n).astype(np.float32)
    ref = _scipy(a) @ x
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    np.testing.assert_allclose(y, ref, atol=4e-7 * np.abs(ref).max())
    y0 = np.asarray(spmv_routed(
        jnp.asarray(x), plan._replace(seg_tbl=None, nseg=0),
        interpret=True))
    np.testing.assert_allclose(y0, ref, atol=4e-7 * np.abs(ref).max())


def test_spmv_routed_fallback_when_padding_too_costly():
    """Tiny per-group budgets make >2-group tiles unavoidable within
    the SEG_PAD_FRAC allowance; the plan must then select the
    per-sub-block fallback kernel (nseg=0) and stay correct."""
    m = n = 4100
    a = st.random(m, n, 0.0085, format="csr", random_state=31)
    plan = _plan(a)
    assert plan is not None
    x = np.random.default_rng(3).standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    ref = _scipy(a) @ x
    np.testing.assert_allclose(y, ref, atol=4e-7 * np.abs(ref).max())


def test_spmm_routed_large_parity():
    """KB-column kernels through a large plan."""
    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    m, n = 2000, 2000
    a = st.random(m, n, 0.034, format="csr", random_state=21)
    plan = _plan(a)
    assert plan is not None
    X = np.random.default_rng(4).standard_normal((n, 5)).astype(
        np.float32)
    Y = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    ref = _scipy(a) @ X
    np.testing.assert_allclose(Y, ref, atol=4e-7 * np.abs(ref).max())


@pytest.mark.parametrize("S", [2, 4, 8])
def test_spmv_routed_stacked_parity(S):
    """Stacked plans (S row-groups pooled per lane-column band, sub-row
    tag in route bits 7..): SciPy parity through the sub-row-split
    matsum reduce, SpMV and SpMM, including a ragged tail super-group
    (ngroups not a multiple of S)."""
    from scipy import sparse as sp

    m, n = 1420, 1300          # 12 groups: ragged for S in {8}
    a = st.random(m, n, 0.006, format="csr", random_state=17)
    plan = _plan(a, stack_override=S)
    assert plan is not None and plan.S == S
    x = np.random.default_rng(6).standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    A64 = sp.csr_matrix((np.asarray(a.data, np.float64),
                         np.asarray(a.indices), np.asarray(a.indptr)),
                        shape=a.shape)
    ref = A64 @ x.astype(np.float64)
    rowabs = abs(A64) @ np.abs(x.astype(np.float64)) + 1e-30
    assert np.max(np.abs(y - ref) / rowabs) < 4e-7

    from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

    X = np.random.default_rng(7).standard_normal((n, 6)).astype(
        np.float32)
    Y = np.asarray(spmm_routed(jnp.asarray(X), plan, interpret=True))
    refM = A64 @ X.astype(np.float64)
    rowabsM = abs(A64) @ np.abs(X.astype(np.float64)) + 1e-30
    assert np.max(np.abs(Y - refM) / rowabsM) < 4e-7


def test_spmv_routed_stacked_fewer_slots():
    """The point of stacking: pooled Poisson tails need fewer slots on
    a low-degree random matrix, and the auto plan exploits it.  (Case =
    the 100k-nnz bench config's degree regime, where the measured
    S-sweep shows stacking decisively wins; at very low degrees the
    NLP quantum can eat the pooling gain and S=1 is legitimately
    chosen — r5 jobs 010/012.)"""
    a = st.random(10000, 10000, 1e-3, format="csr", random_state=23)
    p1 = _plan(a, stack_override=1)
    pa = _plan(a)
    assert p1 is not None and pa is not None
    assert pa.S > 1
    assert pa.NL < p1.NL


def test_spmv_routed_stacked_deterministic():
    """The sub-row-split masked sums + one-hot matmul remain a fixed
    tree: bitwise-identical across calls."""
    a = st.random(900, 900, 0.004, format="csr", random_state=29)
    plan = _plan(a, stack_override=4)
    assert plan is not None
    x = jnp.asarray(
        np.random.default_rng(9).standard_normal(900).astype(np.float32))
    y1 = np.asarray(spmv_routed(x, plan, interpret=True))
    y2 = np.asarray(spmv_routed(x, plan, interpret=True))
    assert np.array_equal(y1, y2)


def test_spmv_routed_stacked_mode_rejects():
    """Stacked plans support only the matsum reduce."""
    a = st.random(600, 600, 0.005, format="csr", random_state=35)
    plan = _plan(a, stack_override=2)
    assert plan is not None
    x = jnp.asarray(np.zeros(600, np.float32))
    with pytest.raises(ValueError, match="stacked plans"):
        spmv_routed(x, plan, interpret=True, mode="seg")


def test_fused_matsum_u1f_mosaic_legal():
    """Every (u1f, nsteps) the fused matsum path can select must satisfy
    Mosaic's block rule: the one-hot's per-step lane slice (u1f*16*S
    columns) is 128-divisible, or the grid is a single step (block ==
    array).  The S=1/S=2 multi-step cases used to produce 32/64-lane
    blocks — rejected by the on-device lowering (v5e r5 job 004; the
    interpret-mode suite cannot catch it)."""
    from spmm_tpu.ops.kernels.spmv_routed import (_ceil_div,
                                                  _fused_matsum_u1f)

    for S in (1, 2, 4, 8):
        for NL in (256, 512, 1024, 1280, 2048, 4608, 9728, 12288):
            if NL % 256:
                continue
            u1f = 2 if NL <= 4096 else 4
            while NL % (u1f * 128):
                u1f //= 2
            nsteps = max(_ceil_div(NL, u1f * 128), 1)
            r = _fused_matsum_u1f(NL, S, u1f, nsteps)
            if r is None:
                continue
            u1f_f, nsteps_f = r
            assert NL % (u1f_f * 128) == 0
            assert nsteps_f == max(_ceil_div(NL, u1f_f * 128), 1)
            assert nsteps_f == 1 or (u1f_f * 16 * S) % 128 == 0, \
                (S, NL, u1f_f, nsteps_f)


def test_spmv_routed_s1_small_plan_matsum_interpret():
    """S=1 tiny-NL plan (the case that crashed on device) — semantics
    via interpret mode after the u1f fix."""
    from scipy import sparse as sp

    rng = np.random.default_rng(3)
    m = n = 2000
    Ac = st.random(m, n, 2e-3, format="csr", random_state=11)
    Ac = Ac.sum_duplicates()
    pl_ = spmv_routed_plan(np.asarray(Ac.indptr), np.asarray(Ac.indices),
                           np.asarray(Ac.data), m, n, stack_override=1)
    assert pl_ is not None and pl_.S == 1
    x = rng.random(n).astype(np.float32)
    y = np.asarray(spmv_routed(jnp.asarray(x), pl_, interpret=True))
    want = sp.csr_matrix((np.asarray(Ac.data), np.asarray(Ac.indices),
                          np.asarray(Ac.indptr)), shape=(m, n)) @ x
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)
