"""SpGEMM tests — the analogue of the reference's `TestSpgemm`
(tests/cupyx_tests/test_cusparse.py:372-455): `spgemm(a, b, alpha) ≈
alpha * a.dot(b)` vs SciPy across dtypes and shapes, invalid-input classes,
plus the repo-level properties: bitwise structural parity, run-to-run
determinism (deterministic/test_deterministic.sh), and inter-algorithm
numerical-error bounds (numerical_error/)."""

import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from helpers import assert_csr_equal_structure, make_pair

ALGS = [0, 1, 2, 3]


@pytest.mark.parametrize("impl", ["dense", "esc"])
@pytest.mark.parametrize("alg", ALGS)
@pytest.mark.parametrize(
    "shape,da,db",
    [((60, 40, 50), 0.1, 0.1),
     ((33, 17, 77), 0.3, 0.2),
     ((100, 100, 100), 0.01, 0.01),
     ((64, 64, 64), 0.5, 0.5)],
)
def test_spgemm_scipy_parity(shape, da, db, alg, impl):
    m, k, n = shape
    A, B, As, Bs = make_pair(m, k, n, da, db)
    C = st.spgemm(A, B, alg=alg, chunk_fraction=0.3, impl=impl)
    ref = (As @ Bs).tocsr()
    assert_csr_equal_structure(C, ref)
    np.testing.assert_allclose(np.asarray(C.toarray()), ref.toarray(),
                               rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("alg", ALGS)
def test_spgemm_alpha(alg):
    A, B, As, Bs = make_pair(40, 30, 35, 0.2, 0.2)
    C = st.spgemm(A, B, alpha=2.5, alg=alg)
    np.testing.assert_allclose(np.asarray(C.toarray()),
                               2.5 * (As @ Bs).toarray(), rtol=2e-5,
                               atol=1e-6)


@pytest.mark.parametrize("alg", ALGS)
def test_spgemm_empty(alg):
    A = st.CSR((8, 9), dtype=jnp.float32)
    B = st.random(9, 7, density=0.3, format="csr", random_state=0)
    C = st.spgemm(A, B, alg=alg)
    assert C.nnz == 0
    assert C.shape == (8, 7)
    C = st.spgemm(B, st.CSR((7, 5), dtype=jnp.float32), alg=alg)
    assert C.nnz == 0 and C.shape == (9, 5)


def test_spgemm_keeps_structural_zeros():
    # cancellation: values sum to zero but the entry must stay (cuSPARSE /
    # SciPy structural semantics)
    A = st.CSR((np.array([1.0, -1.0]), np.array([0, 1]),
                np.array([0, 2])), shape=(1, 2))
    B = st.CSR((np.array([1.0, 1.0]), np.array([0, 0]),
                np.array([0, 1, 2])), shape=(2, 1))
    for alg in ALGS:
        C = st.spgemm(A, B, alg=alg)
        assert C.nnz == 1, f"alg={alg} dropped a structural zero"
        assert np.asarray(C.data)[0] == 0.0


def test_spgemm_validation():
    A = st.random(8, 8, density=0.5, format="csr", random_state=0)
    with pytest.raises(TypeError):
        st.spgemm(A.tocoo(), A)
    with pytest.raises(TypeError):
        st.spgemm(A, A.tocsc())
    B = st.random(9, 9, density=0.5, format="csr", random_state=0)
    with pytest.raises(ValueError):
        st.spgemm(A, B)
    with pytest.raises(ValueError):
        st.spgemm(A, A, alg=7)


def test_spgemm_noncanonical_inputs():
    # duplicate entries must be summed before multiplying (matches
    # reference __mul__ which calls sum_duplicates, _csr.py:156-167)
    row = np.array([0, 0, 1])
    col = np.array([1, 1, 0])
    val = np.array([1.0, 2.0, 4.0])
    A = st.COO((val, (row, col)), shape=(2, 2)).tocsr()
    Araw = st.CSR.from_parts(np.array([0, 2, 3]), col, val, (2, 2),
                             canonical=False)
    for alg in ALGS:
        C = st.spgemm(Araw, A, alg=alg)
        want = A.to_scipy() @ A.to_scipy()
        np.testing.assert_allclose(np.asarray(C.toarray()), want.toarray(),
                                   rtol=1e-6)


@pytest.mark.parametrize("cf", [0.05, 0.2, 0.5, 1.0])
def test_spgemm_chunk_fraction_sweep(cf):
    """All chunk fractions give the same structure and near-identical values
    (numerical_error/fraction.py analogue)."""
    A, B, As, Bs = make_pair(80, 60, 70, 0.15, 0.15)
    C = st.spgemm(A, B, alg=3, chunk_fraction=cf)
    ref = (As @ Bs).tocsr()
    assert_csr_equal_structure(C, ref)
    np.testing.assert_allclose(np.asarray(C.toarray()), ref.toarray(),
                               rtol=2e-5, atol=1e-6)


def test_spgemm_alg_cross_error_small():
    """|C_alg1 − C_alg3| max-abs error stays tiny for U[0,1) fp32 data
    (numerical_error/distribution.py analogue; reference sees ~1e-4..1e-5
    at n=1024 — at this size the bound is tighter)."""
    A, B, _, _ = make_pair(128, 128, 128, 0.1, 0.1)
    C1 = st.spgemm(A, B, alg=1)
    C3 = st.spgemm(A, B, alg=3, chunk_fraction=0.3)
    diff = np.abs(np.asarray(C1.toarray()) - np.asarray(C3.toarray()))
    assert diff.max() < 1e-4


@pytest.mark.parametrize("alg", ALGS)
def test_spgemm_rerun_bitwise_deterministic(alg):
    """Run-to-run bitwise determinism (deterministic/test_deterministic.sh):
    same inputs → bit-identical data, indices, indptr."""
    A, B, _, _ = make_pair(64, 64, 64, 0.2, 0.2, seed=11)
    C1 = st.spgemm(A, B, alg=alg, chunk_fraction=0.25)
    C2 = st.spgemm(A, B, alg=alg, chunk_fraction=0.25)
    np.testing.assert_array_equal(np.asarray(C1.indptr), np.asarray(C2.indptr))
    np.testing.assert_array_equal(np.asarray(C1.indices),
                                  np.asarray(C2.indices))
    np.testing.assert_array_equal(
        np.asarray(C1.data).view(np.uint32),
        np.asarray(C2.data).view(np.uint32))


def test_spgemm_via_operator_defaults():
    A, B, As, Bs = make_pair(50, 40, 45, 0.2, 0.2)
    C = A @ B
    np.testing.assert_allclose(np.asarray(C.toarray()),
                               (As @ Bs).toarray(), rtol=2e-5, atol=1e-6)


def test_spgemm_mixed_formats_via_operator():
    A, B, As, Bs = make_pair(30, 25, 20, 0.3, 0.3)
    got = A @ B.tocsc()
    np.testing.assert_allclose(np.asarray(got.toarray()),
                               (As @ Bs).toarray(), rtol=2e-5, atol=1e-6)
    got = A.tocoo() @ B
    np.testing.assert_allclose(np.asarray(got.toarray()),
                               (As @ Bs).toarray(), rtol=2e-5, atol=1e-6)


def test_spgemm_nnz_estimate():
    A, B, As, Bs = make_pair(30, 25, 20, 0.3, 0.3)
    P, ub = st.spgemm_nnz_estimate(A, B)
    true_nnz = (As @ Bs).nnz
    assert P >= true_nnz
    assert ub >= true_nnz


def test_matmul_scalar_rejected():
    A = st.random(8, 8, density=0.5, format="csr", random_state=0)
    with pytest.raises(ValueError):
        A @ 2.0


def test_alg3_esc_bitwise_invariant_across_chunk_fractions():
    """Stronger than the reference (ESC engine): cuSPARSE ALG3's numerical
    error varies with chunk_fraction (the reference's
    numerical_error/fraction.py exists to study it); the ESC doubling-tree
    reduction is position-relative within each duplicate run, so every
    chunk_fraction — and alg2 itself — produces bitwise-identical values.
    The blocked dense engine matches the reference's weaker contract
    instead (each (input, cf) deterministic run-to-run; see
    test_spgemm_rerun_bitwise_deterministic and the alg3 blocked tests)."""
    A, B, _, _ = make_pair(80, 60, 70, 0.15, 0.15)
    ref_bits = np.asarray(
        st.spgemm(A, B, alg=2, impl="esc").data).view(np.uint32)
    for cf in (0.05, 0.2, 0.5, 1.0):
        C = st.spgemm(A, B, alg=3, chunk_fraction=cf, impl="esc")
        np.testing.assert_array_equal(
            np.asarray(C.data).view(np.uint32), ref_bits)


def test_alg3_blocked_chunk_fraction_struct_invariant():
    """Blocked alg3: structure is exact and values stay within fp32
    accumulation error across chunk fractions (reference ALG3 contract)."""
    A, B, As, Bs = make_pair(90, 70, 75, 0.2, 0.2)
    ref = (As @ Bs).tocsr()
    ref.sort_indices()
    for cf in (0.05, 0.3, 1.0):
        C = st.spgemm(A, B, alg=3, chunk_fraction=cf, impl="dense")
        np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr)
        np.testing.assert_array_equal(np.asarray(C.indices), ref.indices)
        np.testing.assert_allclose(np.asarray(C.data), ref.data,
                                   rtol=2e-5, atol=1e-6)


def test_alg3_scan_streamed_count_matches_fast(monkeypatch):
    """The panel-streamed sizing pass (used past the fast-count byte
    budget) and the resident-pattern fast count produce identical
    structure, and the compute output is bitwise invariant to which one
    sized it."""
    from spmm_tpu.ops import spgemm_blocked as bl

    A, B, _, _ = make_pair(260, 180, 220, 0.12, 0.1)
    C_fast = bl.spgemm_alg3_blocked(A, B, 1.0, 0.3, unroll=False)
    monkeypatch.setattr(bl, "_FAST_COUNT_BUDGET", 0)
    C_slow = bl.spgemm_alg3_blocked(A, B, 1.0, 0.3, unroll=False)
    np.testing.assert_array_equal(np.asarray(C_fast.indptr),
                                  np.asarray(C_slow.indptr))
    np.testing.assert_array_equal(np.asarray(C_fast.indices),
                                  np.asarray(C_slow.indices))
    np.testing.assert_array_equal(np.asarray(C_fast.data).view(np.uint32),
                                  np.asarray(C_slow.data).view(np.uint32))


def test_alg3_fast_count_nonuniform_panels():
    """n=600, cf=0.4 → n_pad=640, n_b=256, P=3: P·n_b > n_pad, the
    regime where the fast count's pattern padding must extend to P·n_b
    (regression: reshape failure at 4096²/cf=0.2)."""
    from spmm_tpu.ops.spgemm_blocked import spgemm_alg3_blocked

    A, B, As, Bs = make_pair(150, 140, 600, 0.1, 0.08)
    C = spgemm_alg3_blocked(A, B, 1.0, 0.4, unroll=False)
    ref = (As @ Bs).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(C.indices), ref.indices)
    np.testing.assert_allclose(np.asarray(C.data), ref.data, rtol=2e-5,
                               atol=1e-30)


def test_alg3_scan_tiny_marker_collision_safe():
    """An input storing the +TINY marker value must take the two-scatter
    safe densify and still produce the exact structural result."""
    from spmm_tpu.ops.spgemm_blocked import _TINY, spgemm_alg3_blocked

    A, B, As, Bs = make_pair(150, 120, 140, 0.1, 0.1)
    data = np.asarray(A.data).copy()
    data[0] = np.float32(_TINY)
    A = st.CSR.from_parts(A.indptr, A.indices, jnp.asarray(data),
                          A.shape, canonical=True)
    C = spgemm_alg3_blocked(A, B, 1.0, 0.3, unroll=False)
    import scipy.sparse as sp

    As2 = sp.csr_matrix((data, np.asarray(A.indices),
                         np.asarray(A.indptr)), shape=A.shape)
    ref = (As2 @ Bs).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(np.asarray(C.indices), ref.indices)
    np.testing.assert_allclose(np.asarray(C.data), ref.data, rtol=2e-5,
                               atol=1e-30)
    assert np.asarray(C.data)[0] != 0 or ref.data[0] != 0


def test_alg3_blocked_unrolled_matches_scan_bitwise():
    """The unrolled single-program alg3 (host-exact sizing, per-tile
    merges) and the scan pipeline build bitwise-identical dense blocks and
    contract them with the same full-k HIGHEST dots, so their outputs are
    bitwise equal — structure and values."""
    from spmm_tpu.ops.spgemm_blocked import spgemm_alg3_blocked

    A, B, _, _ = make_pair(300, 200, 260, 0.1, 0.1)
    for cf in (0.2, 0.6):
        Cu = spgemm_alg3_blocked(A, B, 1.0, cf, unroll=True)
        Cs = spgemm_alg3_blocked(A, B, 1.0, cf, unroll=False)
        np.testing.assert_array_equal(np.asarray(Cu.indptr),
                                      np.asarray(Cs.indptr))
        np.testing.assert_array_equal(np.asarray(Cu.indices),
                                      np.asarray(Cs.indices))
        np.testing.assert_array_equal(
            np.asarray(Cu.data).view(np.uint32),
            np.asarray(Cs.data).view(np.uint32))


def test_alg3_blocked_unrolled_onehot_interpret():
    """The Pallas one-hot densify inside the unrolled alg3 (interpret mode
    on CPU; compiled on real TPU) matches the scatter fallback bitwise."""
    from spmm_tpu.ops.spgemm_blocked import spgemm_alg3_blocked

    A, B, As, Bs = make_pair(256, 256, 256, 0.12, 0.12)
    ref = (As @ Bs).tocsr()
    ref.sort_indices()
    Ci = spgemm_alg3_blocked(A, B, 1.0, 0.4, interpret=True)
    Cs = spgemm_alg3_blocked(A, B, 1.0, 0.4, interpret=False)
    np.testing.assert_array_equal(np.asarray(Ci.indptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(Ci.indices), ref.indices)
    np.testing.assert_array_equal(np.asarray(Ci.data).view(np.uint32),
                                  np.asarray(Cs.data).view(np.uint32))


def test_spgemm_fixed_canonicalizes_inputs():
    # Non-canonical (unsorted, duplicated) inputs must be canonicalized
    # before the densify scatters (reference asserts has_canonical_format;
    # round-1 advisor finding: silent corruption otherwise).
    import scipy.sparse as sp

    # row 0 has unsorted columns AND a duplicate (col 2 twice)
    indptr = np.array([0, 3, 4], np.int32)
    indices = np.array([2, 0, 2, 1], np.int32)
    data = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    A = st.CSR.from_parts(jnp.asarray(indptr), jnp.asarray(indices),
                          jnp.asarray(data), (2, 3), canonical=False)
    B, Bs = _rand_csr(3, 5, 0.6, 7)
    # copies: scipy's sum_duplicates mutates its buffers in place, and
    # jnp.asarray may zero-copy numpy arrays on CPU
    As = sp.csr_matrix((data.copy(), indices.copy(), indptr.copy()),
                       shape=(2, 3))
    As.sum_duplicates()
    As.sort_indices()
    C, nnz = st.spgemm_fixed(A, B)
    ref = (As @ Bs).tocsr()
    np.testing.assert_allclose(np.asarray(C.toarray()), ref.toarray(),
                               rtol=2e-5, atol=1e-6)


def _rand_csr(m, n, density, seed):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    S = sp.random(m, n, density=density, format="csr", dtype=np.float32,
                  random_state=np.random.RandomState(seed))
    A = st.CSR((jnp.asarray(S.data), jnp.asarray(S.indices, jnp.int32),
                jnp.asarray(S.indptr, jnp.int32)), shape=(m, n))
    return A, S


def test_spgemm_tiny_marker_collision():
    # A stored value equal to float32 tiny must survive the value matmul
    # (round-1 advisor finding: the marked-densify path zeroed it).
    tiny = float(np.finfo(np.float32).tiny)
    A = st.CSR((np.array([tiny], np.float32), np.array([0]),
                np.array([0, 1])), shape=(1, 1))
    B = st.CSR((np.array([3.0], np.float32), np.array([0]),
                np.array([0, 1])), shape=(1, 1))
    C = st.spgemm(A, B, alg=1)
    assert float(C.toarray()[0, 0]) == 3.0 * tiny
    C2, _ = st.spgemm_fixed(A, B)
    assert float(C2.toarray()[0, 0]) == 3.0 * tiny


def test_spgemm_fixed_cap_too_small_raises():
    A, _ = _rand_csr(30, 30, 0.3, 1)
    B, _ = _rand_csr(30, 30, 0.3, 2)
    from spmm_tpu.ops.spgemm import spgemm_nnz_estimate

    _, ub = spgemm_nnz_estimate(A, B)
    true_nnz = int(st.spgemm(A, B).nnz)
    if true_nnz > 1:
        with pytest.raises(ValueError):
            st.spgemm_fixed(A, B, cap=true_nnz - 1)


def test_spgemm_fixed_loose_cap_consistent():
    # cap larger than true nnz: padded container must stay self-consistent
    A, As = _rand_csr(25, 20, 0.2, 5)
    B, Bs = _rand_csr(20, 22, 0.2, 6)
    true_nnz = int(st.spgemm(A, B).nnz)
    C, nnz = st.spgemm_fixed(A, B, cap=true_nnz + 13)
    assert int(nnz) == true_nnz
    assert int(C.indptr[-1]) <= C.data.shape[0]
    ref = (As @ Bs).tocsr()
    np.testing.assert_allclose(np.asarray(C.toarray()), ref.toarray(),
                               rtol=2e-5, atol=1e-6)


def test_expand_joined_bitwise_matches_gather_expand():
    """The gather-free sort-join expansion (_expand_joined) must reproduce
    the two-gather _expand pipeline bitwise: same sorted triplets, same
    duplicate order (ascending k), hence identical reduction results."""
    import importlib

    sg = importlib.import_module('spmm_tpu.ops.spgemm')

    for seed, (m, k, n), dens in [(0, (64, 48, 80), 0.15),
                                  (1, (128, 128, 128), 0.05),
                                  (2, (33, 97, 51), 0.3)]:
        A = st.random(m, k, dens, format="csr", random_state=seed)
        B = st.random(k, n, dens, format="csr", random_state=seed + 100)
        counts, ends = sg._work_estimation(A.indices, B.indptr)
        P = int(ends[-1])
        if P == 0:
            continue
        out_j = sg._esc_expand_sort_count(
            A.rows, A.indices, A.data, B.indptr, B.indices, B.data,
            counts, ends, P, m, n, k, True)
        out_g = sg._esc_expand_sort_count(
            A.rows, A.indices, A.data, B.indptr, B.indices, B.data,
            counts, ends, P, m, n, k, False)
        for x, y in zip(out_j, out_g):
            xb = np.asarray(x)
            yb = np.asarray(y)
            assert xb.dtype == yb.dtype
            assert np.array_equal(xb.view(np.uint32), yb.view(np.uint32))


def test_alg2_esc_joined_scipy_parity():
    from scipy import sparse as sp

    import importlib

    sg = importlib.import_module('spmm_tpu.ops.spgemm')

    A = st.random(100, 80, 0.2, format="csr", random_state=11)
    B = st.random(80, 120, 0.2, format="csr", random_state=12)
    C = sg._spgemm_alg2_esc(A, B, 1.0, joined=True)
    As = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                        np.asarray(A.indptr)), shape=A.shape)
    Bs = sp.csr_matrix((np.asarray(B.data), np.asarray(B.indices),
                        np.asarray(B.indptr)), shape=B.shape)
    Cs = (As @ Bs).tocsr()
    Cs.sort_indices()
    np.testing.assert_array_equal(np.asarray(C.indptr), Cs.indptr)
    np.testing.assert_array_equal(np.asarray(C.indices), Cs.indices)
    np.testing.assert_allclose(np.asarray(C.data), Cs.data, rtol=1e-6)


def test_alg3_blocked_three_engines_bitwise():
    """unrolled / scan3 / scan2 forced explicitly over the same inputs:
    bitwise-identical CSR outputs (structure AND values).  Guards the
    round-4 scan2 assembly rework (flat production buffer at exact
    t-major offsets) against any reordering of the merge inputs."""
    from spmm_tpu.ops.spgemm_blocked import spgemm_alg3_blocked

    A, B, _, _ = make_pair(300, 200, 260, 0.1, 0.1)
    for cf in (0.2, 0.6):
        outs = [spgemm_alg3_blocked(A, B, 1.0, cf, engine=e)
                for e in ("unrolled", "scan3", "scan2", "group")]
        for C2 in outs[1:]:
            np.testing.assert_array_equal(np.asarray(outs[0].indptr),
                                          np.asarray(C2.indptr))
            np.testing.assert_array_equal(np.asarray(outs[0].indices),
                                          np.asarray(C2.indices))
            np.testing.assert_array_equal(
                np.asarray(outs[0].data).view(np.uint32),
                np.asarray(C2.data).view(np.uint32))


def test_spgemm_capacity_boundary_100k():
    """The reference's intentionally-huge TestSpgemm shape
    (tests/cupyx_tests/test_cusparse.py:372-410: an ultra-sparse
    100k x 100k case that exercises the memory/OOM boundary).  Here the
    boundary is the dense-intermediate budget gate: at this size the
    dense footprint (~40 GB/panel) must fail `_blocked_feasible` and
    auto dispatch (alg=0) must route to the ESC engine — and still
    return the exact SciPy result."""
    import scipy.sparse as sp

    from spmm_tpu.ops.spgemm import _blocked_feasible

    m = k = n = 100_000
    A = st.random(m, k, 1e-6, format="csr", random_state=42)
    B = st.random(k, n, 1e-6, format="csr", random_state=43)
    assert A.nnz == 10_000 and B.nnz == 10_000
    # the gate: dense panels infeasible -> blocked engines must NOT engage
    assert not _blocked_feasible(A, B)

    C = st.spgemm(A, B, alpha=2.0, alg=0)
    assert C.shape == (m, n)

    As = sp.csr_matrix((np.asarray(A.data), np.asarray(A.indices),
                        np.asarray(A.indptr)), shape=A.shape)
    Bs = sp.csr_matrix((np.asarray(B.data), np.asarray(B.indices),
                        np.asarray(B.indptr)), shape=B.shape)
    Cs = (2.0 * (As @ Bs)).tocsr()
    Cs.sort_indices()
    np.testing.assert_array_equal(np.asarray(C.indptr), Cs.indptr)
    np.testing.assert_array_equal(np.asarray(C.indices), Cs.indices)
    np.testing.assert_allclose(np.asarray(C.data), Cs.data, rtol=1e-6)

    # alg=3 chunked path at the same scale (the reference exercises the
    # chunked low-memory API on the huge shape)
    C3 = st.spgemm(A, B, alpha=2.0, alg=3, chunk_fraction=0.3)
    np.testing.assert_array_equal(np.asarray(C3.indptr), Cs.indptr)
    np.testing.assert_allclose(np.asarray(C3.data), Cs.data, rtol=1e-6)
