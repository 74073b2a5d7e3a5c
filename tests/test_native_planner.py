"""Native routed-SpMV planner (native/spmv_planner.cpp via ctypes).

The C++ sequential-Koenig edge coloring must (a) produce a VALID
coloring (the kernel-side invariants are what matter, not equality with
the numpy coloring — any valid lane assignment yields the same table
sizes and a correct kernel), (b) be deterministic, and (c) degrade to
the numpy path when disabled.  Mirrors the reference's
cross-implementation stance (cupy_cusparse/run_all_alg1.sh): two
independent implementations of the same analysis, checked against the
op-level contract.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from spmm_tpu.ops.kernels import _native_planner
from spmm_tpu.ops.kernels.spmv_routed import spmv_routed_plan

pytestmark = pytest.mark.skipif(
    not _native_planner.available(),
    reason="native planner unavailable (no g++?)")


def _valid_coloring(left, right, capV, lane):
    assert lane.min() >= 0
    assert (lane < capV[left]).all()
    # at most one edge per (node, color) on both sides
    assert np.unique(left * (capV.max() + 1) + lane).size == lane.size
    assert np.unique(right * (capV.max() + 1) + lane).size == lane.size


@pytest.mark.parametrize("seed,nv,deg", [(0, 64, 7), (1, 256, 31),
                                         (2, 128, 128)])
def test_color_edges_valid_and_deterministic(seed, nv, deg):
    rng = np.random.default_rng(seed)
    # random bipartite multigraph with per-node capacity = max degree
    left = rng.integers(0, nv, nv * deg).astype(np.int64)
    right = rng.integers(0, nv, nv * deg).astype(np.int64)
    degs = np.maximum(np.bincount(left, minlength=nv),
                      np.bincount(right, minlength=nv))
    capV = np.full(nv, int(degs.max()), np.int64)
    lane1 = _native_planner.color_edges(left, right, capV)
    lane2 = _native_planner.color_edges(left, right, capV)
    assert lane1 is not None
    _valid_coloring(left, right, capV, lane1)
    np.testing.assert_array_equal(lane1, lane2)


def test_cumcount_matches_argsort():
    rng = np.random.default_rng(3)
    key = rng.integers(0, 97, 10000).astype(np.int64)
    seq = _native_planner.cumcount(key, 97)
    assert seq is not None
    # reference: rank within each key by original position
    order = np.argsort(key, kind="stable")
    ref = np.empty(key.size, np.int64)
    starts = np.zeros(98, np.int64)
    np.cumsum(np.bincount(key, minlength=97), out=starts[1:])
    ref[order] = np.arange(key.size) - starts[key[order]]
    np.testing.assert_array_equal(seq, ref)


@pytest.mark.parametrize("m,n,dens,seed", [(500, 700, 0.02, 0),
                                           (2438, 2587, 0.039, 5),
                                           (4096, 4096, 0.01, 9)])
def test_plan_native_and_numpy_agree_on_structure(m, n, dens, seed,
                                                  monkeypatch):
    """Both planners must produce plans with identical table SIZES (the
    budgets are computed before coloring) and kernel-valid tables."""
    A = sp.random(m, n, dens, format="csr", dtype=np.float32,
                  random_state=seed)
    A.sum_duplicates()
    A.sort_indices()
    p_native = spmv_routed_plan(A.indptr, A.indices, A.data, m, n)
    monkeypatch.setattr(_native_planner, "_lib", None)
    monkeypatch.setattr(_native_planner, "_tried", True)
    p_numpy = spmv_routed_plan(A.indptr, A.indices, A.data, m, n)
    assert (p_native is None) == (p_numpy is None)
    if p_native is None:
        return
    assert p_native.NL == p_numpy.NL
    assert p_native.R == p_numpy.R and p_native.C == p_numpy.C
    assert p_native.nseg == p_numpy.nseg
    for p in (p_native, p_numpy):
        # routed-value mass is conserved: every entry landed exactly once
        assert np.isclose(np.asarray(p.val_tbl).sum(),
                          A.data.sum(), rtol=1e-5)


def test_plan_interpret_parity_native():
    """End-to-end: native-planned kernel matches scipy (interpret mode)."""
    import jax.numpy as jnp

    from spmm_tpu.ops.kernels.spmv_routed import spmv_routed

    m, n = 1000, 1300
    A = sp.random(m, n, 0.03, format="csr", dtype=np.float32,
                  random_state=11)
    A.sum_duplicates()
    A.sort_indices()
    plan = spmv_routed_plan(A.indptr, A.indices, A.data, m, n)
    assert plan is not None
    x = np.random.default_rng(0).random(n, np.float32)
    y = np.asarray(spmv_routed(jnp.asarray(x), plan, interpret=True))
    ref = A @ x
    scale = np.abs(ref).max()
    assert np.abs(y - ref).max() <= 4e-7 * max(scale, 1.0)
