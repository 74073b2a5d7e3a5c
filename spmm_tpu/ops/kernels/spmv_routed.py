"""Pallas TPU SpMV with plan-time row routing: gather + permute + sum.

The third-generation fixed-structure SpMV (after kernels/spmv_onehot's
one-hot MXU gather and kernels/spmv_binned's lane gather + masked-select
reduce) — the TPU analogue of cuSPARSE's SpMV analysis phase
(/root/reference modify_src/cupy-src/cupyx/cusparse.py:1373-1438).

Key idea: `spmv_binned`'s reduce pays ~128 VPU ops per entry to select
each product into its row's lane at runtime.  But the plan controls BOTH
sides of the product array: the gather constrains only an entry's
SUBLANE (= its column class, so `take_along_axis` can fetch x), and the
reduce constrains only its LANE (= its row residue, so a plain sublane
sum accumulates rows).  An entry's lane within its class bin is free —
so choose it at plan time such that, within every lane-row of the
(transposed) product array, no two entries share a row.  That is a
bipartite edge-coloring of the (class, row) multigraph of each 128-row
group: colors = lane-rows, and by König's theorem max(bin size, row
degree) colors suffice.  The plan Δ-regularises each group's multigraph
with dummy edges and peels perfect matchings (scipy Hopcroft–Karp, all
groups fused block-diagonally so each color round is ONE matching).

Pipeline — ONE fused Pallas kernel (no z intermediate, no XLA repack):
per (128, 128) tile, lane-gather x by class (C column tiles), transpose
in-register, one static lane-permute (`take_along_axis` with the plan's
route table) moves each x value to lane = its row's residue, multiply
by the values stored directly in ROUTED layout (val_tbl[lane-row, rho];
dead slots carry 0.0 so no mask/select/max ops are needed — measured
round 3), then the boundary-split masked sums accumulate into the
lane-major (G, 128) y accumulator.  The hi (gather-index) table is int8
when C == 1 (n ≤ 16384) and int16 otherwise — 6-7 B/slot streamed vs
round 2's 9 (the measured pure-stream floor at 6 B/slot is 73-78
Gnnz/s; the kernel runs at ~36, bounded by the two lane-gathers at
~125 ns/tile — probed round 3, jobs 007-012).  `spmm_routed` runs the
same route for KB columns of a dense X per table stream (a two-kernel
variant, since the KB-wide z blocks don't fit the fused accumulator
pattern).

Exactness: products are val * x[col] in f32 (x bitwise through the
gathers — permute-then-multiply is bitwise the old multiply-then-
permute), accumulation is an exact f32 sum in a fixed plan+compiler
determined tree order — deterministic across runs, same accuracy class
as spmv_binned.

Slack: the padded-slot count is L_g = max over the group of (class bin
size / R, row degree), rounded to the row-block granularity — BOTH
~3-sigma Poisson tails on random matrices, and measured throughput
scales exactly with 1/slots (v5e job 101).  Round 4 added GROUP
STACKING (plan field S): S consecutive 128-row groups share one
lane-column band and the coloring runs on the POOLED multigraph, so
the per-group tail shrinks ~1/sqrt(S) — slots/nnz 2.62 → 1.64 at
avg degree 10 (10k²/1e-3, S=8 → 23 Gnnz/s, was 13.3) and 1.44 → 1.25
at 1M nnz (S=2, the auto cost model's pick).  Same-group spill
sections provably cannot help (the worst row still needs maxdeg lanes
total) and per-tile seg/fallback branching costs ~33% everywhere
(Mosaic predication) — see CLAUDE.md; stacking is the move that works
because it relaxes the GROUP quantum rather than capping budgets.
Plans with pathological skew return None and callers fall back to
spmv_binned.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

from spmm_tpu.utils import memtrace

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32

U1 = 8           # kernel-1 tiles per grid step
SB = 8           # kernel-2 sub-block rows (and the lane granularity)
U2 = 16          # kernel-2 sub-blocks per grid step
_C_MAX = 8
SEG_PAD_FRAC = 0.15  # max slot slack accepted to guarantee <= 2
#                      group segments per tile (seg2 kernel gate)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ceil_div(x, m):
    return -(-x // m)


class SpmvRoutedPlan(NamedTuple):
    m: int
    n: int
    NL: int               # total lane-rows (slots = NL * 128)
    nsteps1: int
    nsteps2: int
    R: int                # class replication (sublanes per class)
    C: int                # x-table column tiles
    hi_tbl: jnp.ndarray   # (NL, 128) — gather index per slot in GATHER
    #                       layout (row = tile*128 + class-sublane);
    #                       int8 when C == 1, int16 otherwise
    val_tbl: jnp.ndarray  # (NL, 128) f32 — values in ROUTED layout
    #                       (row = lane-row, col = row residue rho);
    #                       0.0 = dead slot (doubles as the mask)
    route_tbl: jnp.ndarray  # (NL, 128) i8 — per lane-row: source class
    #                         (sublane) for each row-slot lane; dead
    #                         slots point at 0 (their val is 0.0)
    r0s: jnp.ndarray      # (nsteps2*U2,) i32 — group base row per
    #                       SB-row sub-block (multiple of 128)
    seg_tbl: Optional[jnp.ndarray] = None  # (NL//128,) i32 — per tile:
    #                       first group << 5 | boundary sub-block (16 =
    #                       group-pure tile); None when nseg == 0
    nseg: int = 0         # 2 = boundary-split y updates (<= 2 group
    #                       segments per tile guaranteed); 0 = fallback
    #                       per-sub-block updates
    S: int = 1            # row-group stack factor: S consecutive 128-row
    #                       groups share one lane-column band (their
    #                       Poisson maxdeg tails POOL — slack ~2.6 -> ~1.4
    #                       at avg degree 10); each slot's sub-row index
    #                       rides route_tbl bits 7.. (int8 spare bit at
    #                       S=2, int16 route at S=4) and the reduce is
    #                       the dense-subsum + one-hot matmul split by
    #                       sub-row ("matsum"); S == 1 is the round-3
    #                       layout, bit-identical tables


def _greedy_color(left, right, gr, capV, colors: int, nnz: int):
    """Vectorised greedy lane assignment with conflict repair.

    Invariants to satisfy: at most one entry per (left node, lane) and
    per (right node, lane), lane < the entry's group budget.  Start
    from the per-left rank (distinct per left by construction), then
    repeatedly reassign conflicted entries to their first mutually-free
    lane.  Returns per-entry lanes, or None if conflicts persist (the
    caller falls back to the exact matching peel)."""
    NV = capV.shape[0]
    # initial candidate: per-left rank, rotated by a per-left hash so
    # the right-side collisions don't all pile up at low lanes
    order = np.argsort(left, kind="stable")
    rank = np.empty(nnz, np.int64)
    cnts = np.bincount(left, minlength=NV)
    starts = np.zeros(NV + 1, np.int64)
    np.cumsum(cnts, out=starts[1:])
    rank[order] = np.arange(nnz, dtype=np.int64) - starts[left[order]]
    lane = (rank + (left * 2654435761) % 1024) % capV[left]

    def _first_per_key(keys):
        """Mask of first occurrences per key (argsort-based — ~50x
        np.minimum.at on million-entry batches)."""
        o = np.argsort(keys, kind="stable")
        f = np.empty(keys.size, bool)
        ks = keys[o]
        f_o = np.empty(keys.size, bool)
        f_o[0:1] = True
        f_o[1:] = ks[1:] != ks[:-1]
        f[o] = f_o
        return f

    # bool occupancy for the bulk rounds; ALL round work is elementwise
    # (this host's numpy runs wide 2-D temporaries at ~25 MB/s, so the
    # (pending, colors) free-matrix formulation was 100x slower)
    obL = np.zeros((NV, colors), bool)
    obR = np.zeros((NV, colors), bool)
    pending = np.arange(nnz, dtype=np.int64)
    prev = nnz + 1
    for rnd in range(48):
        if pending.size == 0:
            break
        pl_, pr_, ln = left[pending], right[pending], lane[pending]
        winL = _first_per_key(pl_ * colors + ln)
        winR = _first_per_key(pr_ * colors + ln)
        ok = (winL & winR & ~obL[pl_, ln] & ~obR[pr_, ln]
              & (ln < capV[pl_]))
        took = pending[ok]
        obL[left[took], lane[took]] = True
        obR[right[took], lane[took]] = True
        pending = pending[~ok]
        if pending.size * 10 > prev * 9:
            break  # stagnating: the rest are truly stuck — Kempe repair
        prev = pending.size
        # reassign each pending entry to a pseudo-random mutually-free
        # lane (deterministic hash; first-free would herd all of one
        # row's conflicts onto the same lane).  Probe a few candidates
        # elementwise; entries that miss retry next round re-salted.
        pl_, pr_ = left[pending], right[pending]
        cap = capV[pl_]
        r0 = (pending * 2654435761 + rnd * 40503) % cap
        ln_new = lane[pending]
        found = np.zeros(pending.size, bool)
        for t in range(8):
            cand = r0 + t
            cand -= np.where(cand >= cap, cap, 0)
            okf = ~found & ~obL[pl_, cand] & ~obR[pr_, cand]
            ln_new = np.where(okf, cand, ln_new)
            found |= okf
        lane[pending] = ln_new
    if pending.size == 0:
        return lane
    if pending.size > max(16384, nnz // 8):
        return None  # greedy failed broadly: exact peel is cheaper

    # occupant-id tables for the repair walks
    assigned = np.ones(nnz, bool)
    assigned[pending] = False
    aid = np.flatnonzero(assigned)
    occL = np.full((NV, colors), -1, np.int64)
    occR = np.full((NV, colors), -1, np.int64)
    occL[left[aid], lane[aid]] = aid
    occR[right[aid], lane[aid]] = aid

    # Kempe-chain repair (König's constructive step): for entry (l, r)
    # with no mutually-free lane, take lane a free at l and b free at r,
    # swap colors a/b along the maximal alternating chain from r — the
    # chain cannot reach l, so a becomes free at both ends.
    for e in pending:
        l, r, cap = int(left[e]), int(right[e]), int(capV[left[e]])
        fl = np.flatnonzero(occL[l, :cap] < 0)
        fr = np.flatnonzero(occR[r, :cap] < 0)
        if fl.size == 0 or fr.size == 0:
            return None  # node saturated beyond budget: exact peel
        common = np.intersect1d(fl, fr, assume_unique=True)
        if common.size:
            c = int(common[0])
            lane[e] = c
            occL[l, c] = e
            occR[r, c] = e
            continue
        a, b = int(fl[0]), int(fr[0])
        # walk from r: edge colored a at r, then b at its left, ...
        node, side, col = r, "R", a
        chain = []
        while True:
            e2 = int(occR[node, col]) if side == "R" else \
                int(occL[node, col])
            if e2 < 0:
                break
            chain.append(e2)
            if side == "R":
                node, side = int(left[e2]), "L"
            else:
                node, side = int(right[e2]), "R"
            col = b if col == a else a
        # swap a<->b along the chain
        for e2 in chain:
            l2, r2, c2 = int(left[e2]), int(right[e2]), int(lane[e2])
            nc = b if c2 == a else a
            occL[l2, c2] = -1
            occR[r2, c2] = -1
            lane[e2] = nc
        for e2 in chain:
            l2, r2, c2 = int(left[e2]), int(right[e2]), int(lane[e2])
            occL[l2, c2] = e2
            occR[r2, c2] = e2
        if occL[l, a] >= 0 or occR[r, a] >= 0:
            return None  # chain reached l (shouldn't happen): exact peel
        lane[e] = a
        occL[l, a] = e
        occR[r, a] = e
    return lane


def _color_groups(gr, cls, rho, ngroups: int, m128: int, R: int, L_g):
    """Assign each entry a lane-row (color) within its group such that
    (a) at most one entry per (lane-row, sublane) — the class's R
    sublane copies take a bin's entries round-robin — and (b) no two
    entries of one row share a lane-row.  Constructive: Δ-regularise
    the (sublane, row) bipartite multigraph of every group with dummy
    edges and peel perfect matchings — all groups fused as one
    block-diagonal graph, so each color round is ONE scipy
    Hopcroft–Karp matching.  Returns (per-entry lane-row local to the
    group, per-entry sublane), or (None, None) on failure."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import maximum_bipartite_matching

    from spmm_tpu.ops.kernels import _native_planner

    nnz = gr.shape[0]
    colors = int(L_g.max())
    capL_g = L_g.astype(np.int64)
    # distribute each (g, class) bin's entries round-robin over the
    # class's R sublane copies
    keyc = gr * m128 + cls
    seqc = _native_planner.cumcount(keyc, ngroups * m128)
    if seqc is None:
        order = np.argsort(keyc, kind="stable")
        seqc = np.empty(nnz, np.int64)
        cnt_c = np.bincount(keyc, minlength=ngroups * m128)
        starts = np.zeros(ngroups * m128 + 1, np.int64)
        np.cumsum(cnt_c, out=starts[1:])
        seqc[order] = (np.arange(nnz, dtype=np.int64)
                       - starts[keyc[order]])
    sub = cls + (seqc % R) * m128           # final sublane per entry
    left = gr * 128 + sub                   # capacity-1 left node
    right = gr * 128 + rho                  # capacity-1 right node

    NV = ngroups * 128
    capV = np.repeat(capL_g, 128)                 # per-node color budget
    padL = capV - np.bincount(left, minlength=NV)
    padR = capV - np.bincount(right, minlength=NV)
    if (padL < 0).any() or (padR < 0).any():
        return None, None

    # fastest path: native sequential Koenig construction (C++, ctypes —
    # native/spmv_planner.cpp).  Budgets cover the degrees (checked just
    # above), so it is guaranteed to succeed; ~50-100x the numpy rounds
    # (the cuSPARSE-analysis-is-milliseconds parity item, VERDICT r2
    # weak-2).  Falls through to the numpy paths when the library is
    # unavailable.
    from spmm_tpu.ops.kernels import _native_planner

    lane_n = _native_planner.color_edges(left, right, capV)
    if lane_n is not None:
        return lane_n, sub

    # fast path: vectorised greedy + conflict repair.  The SB-granular
    # rounding of L_g leaves free lanes on most nodes, so random
    # conflicts almost always resolve in a few rounds; the exact
    # matching peel below is the guaranteed fallback (measured: greedy
    # colors 1M entries in ~1 s vs ~40 s for the peel).
    lane_g = _greedy_color(left, right, gr, capV, colors, nnz)
    if lane_g is not None:
        return lane_g, sub
    # dummy edges regularise every node of group g to degree L_g; both
    # sides of a group miss the same total (128*L_g - nnz_g), and
    # np.repeat emits them in group order, so dummyL[i]/dummyR[i] always
    # belong to the same group
    dummyL = np.repeat(np.arange(NV, dtype=np.int64), padL)
    dummyR = np.repeat(np.arange(NV, dtype=np.int64), padR)
    allL = np.concatenate([left, dummyL])
    allR = np.concatenate([right, dummyR])

    lane_out = np.full(nnz, -1, np.int64)
    # compacted active-edge arrays; eids track original positions
    eids = np.arange(allL.shape[0], dtype=np.int64)
    curL, curR = allL, allR
    sentinel = np.int64(1) << 62
    for color in range(colors):
        if eids.size == 0:
            break
        # the active multigraph is (L_g - color)-regular per group, so a
        # maximum matching saturates every still-active node
        g = csr_matrix((np.ones(eids.size, np.int8), (curL, curR)),
                       shape=(NV, NV))
        match = maximum_bipartite_matching(g, perm_type="column")
        pick = match[curL] == curR              # edges between matched pairs
        # keep exactly one edge per matched left node (multi-edges and
        # parallel dummies collapse to the lowest edge position)
        first = np.full(NV, sentinel)
        pos = np.flatnonzero(pick)
        np.minimum.at(first, curL[pos], pos)
        takepos = first[curL[pos]] == pos
        chosen_pos = pos[takepos]
        chosen = eids[chosen_pos]
        real = chosen[chosen < nnz]
        lane_out[real] = color
        keep = np.ones(eids.size, bool)
        keep[chosen_pos] = False
        eids = eids[keep]
        curL = curL[keep]
        curR = curR[keep]
    if (lane_out < 0).any():
        return None, None
    return lane_out, sub


def spmv_routed_plan(indptr_host, indices_host, data_host,
                     m: int, n: int,
                     stack_override: Optional[int] = None
                     ) -> Optional[SpmvRoutedPlan]:
    """Host-side analysis: route every entry to (lane-row, sublane,
    row-slot) coordinates; see module docstring.  `stack_override`
    forces the row-group stack factor S (A/B probes and tests)."""
    indptr = np.asarray(indptr_host)
    indices = np.asarray(indices_host, np.int64)
    data = np.asarray(data_host)
    nnz = int(indptr[-1])
    if nnz == 0 or m <= 0 or n > _C_MAX * 128 * 128:
        return None

    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    gr = rows >> 7
    rho = rows & 127
    ngroups = _ceil_div(m, 128)

    # pick (S, R) to balance bin skew against row degree:
    # L_g = max(ceil(maxbin/R) [bin side], maxdeg [row side]) per
    # S-stacked super-group — stacking pools both Poisson tails over S
    # groups (max of Poisson(S·λ) ≈ S·λ + O(√(S·λ)) beats S times the
    # single-group tail), at the cost of S sub-row masked sums in the
    # reduce and (for S > 2) an int16 route table
    degR = np.bincount(gr * 128 + rho, minlength=ngroups * 128)
    # one base bincount at m128=128; coarser candidates fold it
    # (indices % 64 bins are pairwise sums of indices % 128 bins, etc.)
    cnt128 = np.bincount(gr * 128 + indices % 128,
                         minlength=ngroups * 128).reshape(ngroups, 128)
    G_pad_cost = _round_up(ngroups, 8)
    if stack_override is not None and int(stack_override) not in (1, 2, 4, 8):
        # correctness requires a power-of-two S: the sub-row tag decode
        # `(r >> 7) & (S - 1)` mis-extracts for S = 3, 6, ... silently
        raise ValueError(f"stack_override must be one of (1, 2, 4, 8), "
                         f"got {stack_override}")
    stack_cands = ((1, 2, 4, 8) if stack_override is None
                   else (int(stack_override),))
    best = None
    for S_c in stack_cands:
        nsuper = _ceil_div(ngroups, S_c)
        pad_g = nsuper * S_c - ngroups
        deg_s = degR.reshape(ngroups, 128)
        cnt_s = cnt128
        if S_c > 1:
            if pad_g:
                deg_s = np.concatenate(
                    [deg_s, np.zeros((pad_g, 128), deg_s.dtype)])
                cnt_s = np.concatenate(
                    [cnt_s, np.zeros((pad_g, 128), cnt_s.dtype)])
            deg_s = deg_s.reshape(nsuper, S_c, 128).sum(axis=1)
            cnt_s = cnt_s.reshape(nsuper, S_c, 128).sum(axis=1)
        maxdeg = deg_s.max(axis=1)
        for R_c in (1, 2, 4):
            m128 = 128 // R_c
            C_c = max(1, _ceil_div(_ceil_div(n, m128), 128))
            if C_c > _C_MAX:
                continue
            maxbin = cnt_s.reshape(nsuper, R_c, m128).sum(axis=1) \
                .max(axis=1)
            L_gc = np.maximum(
                SB, _ceil_div(np.maximum(_ceil_div(maxbin, R_c), maxdeg),
                              SB) * SB)
            # rank candidates by the PADDED slot count the kernel will
            # actually stream (NLP quantum: u1f tiles for stacked plans,
            # the two-kernel 1024/128 quanta at S == 1) — raw slots made
            # S=8 beat S=4 at 100k nnz even though both pad to the same
            # NLP and S=4's reduce is cheaper (r5).  S=1 candidates are
            # priced with the seg-alignment padding they will actually
            # take (and at the matsum rate when seg2 cannot apply).
            if S_c == 1:
                Lp_c = _seg2_padded_budgets(L_gc, nnz)
                seg2_ok = Lp_c is not None and ngroups <= 8191
                NL_c = _round_up(
                    int((Lp_c if seg2_ok else L_gc).sum()), 128)
                NLP_c = max(_round_up(NL_c, U1 * 128),
                            _round_up(NL_c, SB * U2))
                pen_1 = 1.0 if seg2_ok else 1.08
            else:
                NL_c = _round_up(int(L_gc.sum()), 128)
                NLP_c = _round_up(
                    NL_c, (4 if NL_c > U1F_SMALL_NL else 2) * 128)
            slots_c = NLP_c * 128
            if S_c > 1:
                # stacked plans reduce via the dense-subsum + one-hot
                # matmul only — respect its budget
                nsb_c = _round_up(int(L_gc.sum()), 128) // SB
                if G_pad_cost * nsb_c * S_c > _MATSUM_MAX_ONEHOT:
                    continue
            # per-extra-x-tile cost measured on v5e (job 101): C=3 runs
            # at ~1.53x the per-slot cost of C=1 (each extra tile adds a
            # lane-gather + select per product tile), so +26%/tile — the
            # round-2 model's 3% badly under-penalised C and picked
            # R=4/C=3 plans that LOST to R=1/C=1 despite fewer slots.
            # Stacking penalties MEASURED on v5e (r5 jobs 010/012,
            # S-sweeps at 100k/1M/1.34M nnz with (K2-K1)·t ≥ 100 ms):
            # the S=1 seg2 kernel runs at 19.8-20.2 ps/slot while EVERY
            # stacked plan reduces via matsum at 24.4 (S=2) / 27.4
            # (S=4) / ~36 (S=8) — so stacking pays only where its slot
            # savings exceed ~21% (true at 100k nnz: 2.62 → 1.97; false
            # at the 1M/16k configs, where S=1+seg2 measured 34.3/34.4
            # Gnnz/s vs S=2's 32.9/31.0).  The r4 pens (1.03/1.10/1.22)
            # got both regimes wrong.  The fused matsum epilogue adds a
            # per-slot term growing with G_pad·S (the (G_pad, nrow)
            # one-hot dot per step): ~0.005 ps · G_pad · S against the
            # ~31 ps base (jobs 003/010: 51.5 → 62.3 ps/slot from
            # m=10k → 40k at S=8, ΔG_pad·S·0.005 ≈ 9.6 ≈ measured
            # +10.8).  S=1 is priced at the seg2 rate — tiny-budget
            # plans where seg2 cannot apply land on matsum at a similar
            # net rate (21.7 measured at 100k), so the error is small
            # and errs toward the simpler plan.
            pen_s = {1: pen_1 if S_c == 1 else 1.0, 2: 1.21, 4: 1.45,
                     8: 1.9}.get(S_c, 2.2)
            epi = 0.00016 * G_pad_cost * S_c
            cost = slots_c * ((1.0 + 0.26 * (C_c - 1)) * pen_s + epi)
            if best is None or cost < best[0]:
                best = (cost, S_c, R_c, C_c, L_gc)
    if best is None:
        return None
    _, S, R, C, L_g = best
    nsuper = _ceil_div(ngroups, S)
    sgr = gr // S if S > 1 else gr
    srow = gr - sgr * S
    m128 = 128 // R
    cls = indices % m128
    q = indices // m128
    slots = int(L_g.sum()) * 128
    if slots > 8 * max(nnz, 1) or slots > (1 << 27):
        return None
    L_g = L_g.astype(np.int64)

    # NOTE (round 3, measured on v5e): a same-group spill section (cap
    # each group's budget, reroute overflow to appended pseudo-groups)
    # can NEVER win — the worst row still needs maxdeg lanes TOTAL, so
    # cap + spill-budget >= maxdeg, and a per-tile seg/fallback branch
    # inside the kernel costs ~33% on EVERY tile (Mosaic predication
    # pays both sides: 34.4 -> 25.9 Gnnz/s at 1M nnz with zero
    # fallback tiles).  Slack reduction below max(maxdeg, maxbin/R)
    # therefore requires re-homing overflow ROWS (a y-recombination
    # epilogue), not sections — measured dead end recorded in
    # CLAUDE.md; budgets stay the two-tail maxima here.

    # seg padding: align group budgets so no 128-lane-row tile spans
    # more than TWO groups — then every tile's y updates collapse to 2
    # (prefix/suffix masked sums, branch-free kernel).  Walk groups: if
    # a group ends mid-tile and another group already ended in that
    # tile, pad it to the tile end.  Accepted only when the added slack
    # stays under SEG_PAD_FRAC; otherwise the plan keeps the unpadded
    # budgets and the per-sub-block fallback kernel runs instead.
    TU = 128 // SB
    if S == 1:
        Lp = _seg2_padded_budgets(L_g, nnz)
        if Lp is not None:
            L_g = Lp

    lane_local, sub = _color_groups(sgr, cls, rho, nsuper, m128, R, L_g)
    if lane_local is None:
        return None

    lane_base = np.zeros(nsuper + 1, np.int64)
    np.cumsum(L_g, out=lane_base[1:])
    NL = _round_up(int(lane_base[-1]), 128)
    if S == 1:
        nsteps1 = max(_ceil_div(NL, U1 * 128), 1)
        NL1 = nsteps1 * U1 * 128
        rows_per_step2 = SB * U2
        nsteps2 = max(_ceil_div(NL, rows_per_step2), 1)
        NL2 = nsteps2 * rows_per_step2
        NLP = max(NL1, NL2)
    else:
        # stacked plans run ONLY the fused matsum kernel (u1f <= 4), so
        # the table pads to the kernel's u1f quantum, not the two-kernel
        # path's 1024 — at small NL the 1024 quantum ate the entire
        # pooling gain (e.g. 1250 lanes -> 2048)
        NLP = _round_up(NL, (4 if NL > U1F_SMALL_NL else 2) * 128)
        nsteps1 = max(_ceil_div(NLP, U1 * 128), 1)
        nsteps2 = max(_ceil_div(NLP, SB * U2), 1)

    lane = lane_base[sgr] + lane_local      # global lane-row per entry
    tile = lane >> 7
    ll = lane & 127

    # the gather-index table is tile-major by SUBLANE (a tile's block
    # rows are its 128 class-sublanes, its columns the 128 lane-rows);
    # the route and VALUE tables are tile-major by LANE-ROW in routed
    # layout (row = lane-row, col = row residue) so the kernel multiplies
    # after the permute and dead slots need no mask (val 0.0).  Stacked
    # plans tag each slot's sub-row in route bits 7.. (dead slots tag 0,
    # their 0.0 value makes the landing row irrelevant).
    hi_dt = np.int8 if C == 1 else np.int16
    rt_dt = np.int8 if S <= 2 else np.int16
    hi_tbl = np.zeros((NLP * 128,), hi_dt)
    val_rt = np.zeros((NLP, 128), np.float32)
    route = np.zeros((NLP, 128), rt_dt)
    flat_g = (tile * 128 + sub) * 128 + ll
    hi_tbl[flat_g] = q.astype(hi_dt)
    val_rt[lane, rho] = data.astype(np.float32)
    route[lane, rho] = (sub | (srow << 7)).astype(rt_dt)

    # base row per SB-row sub-block (sub-blocks are (super-)group-pure:
    # all budgets are multiples of SB); dead sub-blocks (layout pad +
    # grid tail) point at the last (super-)group and add +0.0
    units = np.repeat(np.arange(nsuper, dtype=np.int64), L_g // SB)
    grp = np.full(NLP // SB, nsuper - 1, np.int64)
    grp[:units.size] = units
    r0s = (grp * S * 128).astype(np.int32)

    seg_tbl = None
    nseg = 0
    if S == 1:
        # per-tile packed segment word: g1 (13 bits) | g2 (13 bits) |
        # boundary sub-block (5 bits).  Unlike round 2's encoding, g2 is
        # explicit (not assumed g1+1), so any two-group tile packs.  The
        # boundary-split kernel is branch-free, so it applies only when
        # EVERY tile packs (a per-tile seg/fallback branch costs ~33% on
        # all tiles — Mosaic predication executes both sides; measured
        # round 3); otherwise the per-sub-block fallback kernel runs.
        # Stacked plans always reduce via the sub-row-split dense-subsum
        # + one-hot matmul instead (gated at plan selection).
        gt = grp.reshape(-1, TU)
        nrun = 1 + (gt[:, 1:] != gt[:, :-1]).sum(axis=1)
        if int(nrun.max()) <= 2 and ngroups <= 8191:
            k_pref = TU - (gt != gt[:, :1]).sum(axis=1)
            w = ((gt[:, 0] << 18) | (gt[:, -1] << 5)
                 | np.where(nrun == 1, TU, k_pref))
            seg_tbl = jnp.asarray(w.astype(np.int32))
            nseg = 2

    return SpmvRoutedPlan(
        m=m, n=n, NL=NLP, nsteps1=nsteps1, nsteps2=nsteps2, R=R, C=C,
        hi_tbl=jnp.asarray(hi_tbl.reshape(NLP, 128)),
        val_tbl=jnp.asarray(val_rt),
        route_tbl=jnp.asarray(route),
        r0s=jnp.asarray(r0s), seg_tbl=seg_tbl, nseg=nseg, S=S)


U1F = 4          # fused-kernel tiles per grid step at large NL.
#                  Measured on v5e: with the routed-value layout + seg
#                  reduce U1F=4 wins at 1M nnz (30.3 vs 34.4 us, job
#                  004) and U1F=8 regresses; at small NL (16-tile
#                  plans) U1F=4 LOSES (7.6 vs 4.6 us at 100k nnz, job
#                  015) so `_u1f_for` drops to 2 below the threshold.
#                  NLP is a multiple of U1*128=1024, so the grid
#                  divides the padded tables for any U1F <= 8.
U1F_SMALL_NL = 4096   # lane-rows below which U1F=2 wins
_U1F_OVERRIDE = None  # experiment hook (jobs): force a specific u1f


def _u1f_for(NL: int) -> int:
    if _U1F_OVERRIDE is not None:
        return _U1F_OVERRIDE
    return 2 if NL <= U1F_SMALL_NL else U1F


def _routed_products(xq, hi, route_r, val_r, C: int, S: int = 1):
    """Shared tile body: lane-gather x by class, transpose, route to
    (lane-row, rho), multiply by routed-layout values (dead slots 0.0 —
    no mask ops).  Bitwise equal to the round-2 multiply-then-permute
    formulation.  Stacked plans (S > 1) carry the sub-row tag in route
    bits 7.., masked off here (sign-extension of the int8 S=2 form is
    two's-complement safe: (-x) & 127 == sub)."""
    idx = hi.astype(jnp.int32)
    if C > 1:
        idx = idx & 127
    xv = jnp.take_along_axis(xq[0:128, :], idx, axis=1)
    for t in range(1, C):
        xt = jnp.take_along_axis(xq[t * 128:(t + 1) * 128, :], idx,
                                 axis=1)
        xv = jnp.where((hi.astype(jnp.int32) >> 7) == t, xt, xv)
    r = route_r.astype(jnp.int32)
    if S > 1:
        r = r & 127
    return val_r * jnp.take_along_axis(xv.T, r, axis=1)


def _fused_kernel(r0s_ref, hi_ref, val_ref, route_ref, xq_ref, y_ref,
                  *, C: int, u1f: int):
    """Gather + route + sublane-sum in ONE kernel: the z intermediate
    (write + read ≈ 8 of the ~17 HBM bytes/slot) never exists.
    Sub-blocks of SB lane-rows are group-pure, so each sums straight
    into its group's row of the (G_pad, 128) accumulator.  Fallback for
    plans whose tiles exceed 2 group segments (nseg == 0)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    iota8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        routed = _routed_products(xq, hi_ref[sl, :], route_ref[sl, :],
                                  val_ref[sl, :], C)
        for u in range(128 // SB):
            y_win = jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                            keepdims=True)
            g = r0s_ref[(i * u1f + j) * (128 // SB) + u] >> 7
            s = pl.multiple_of(g & (-8), 8)
            y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
            y_ref[pl.ds(s, 8), :] += y8


def _fused_kernel_seg(seg_ref, hi_ref, val_ref, route_ref, xq_ref, y_ref,
                      *, C: int, u1f: int):
    """Boundary-split variant of `_fused_kernel`: the plan guarantees
    <= 2 group segments per 128-lane-row tile (any two groups — the
    word packs g1<<18 | g2<<5 | boundary), so the 16 per-sub-block
    masked dynamic y updates collapse to TWO — segment 1 a
    prefix-masked full-tile sum, segment 2 a suffix-masked sum (NOT
    total - prefix: subtracting the prefix cancels catastrophically
    when the two groups' magnitudes differ — measured 100% relative
    error on 1e8-vs-1e-4 scale splits; two direct masked reduces cost
    the same).  Group-pure tiles carry boundary 16, so segment 2 adds
    an exact +0.0.  Branch-free on purpose: a per-tile seg/fallback
    branch costs ~33% on every tile (measured round 3)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    iota8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota128 = lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        routed = _routed_products(xq, hi_ref[sl, :], route_ref[sl, :],
                                  val_ref[sl, :], C)
        w = seg_ref[i * u1f + j]
        g1 = w >> 18
        g2 = (w >> 5) & 0x1FFF
        b8 = (w & 31) * SB
        c1 = jnp.sum(jnp.where(iota128 < b8, routed, 0.0), axis=0,
                     keepdims=True)
        c2 = jnp.sum(jnp.where(iota128 >= b8, routed, 0.0), axis=0,
                     keepdims=True)
        s1 = pl.multiple_of(g1 & (-8), 8)
        y_ref[pl.ds(s1, 8), :] += jnp.where(iota8 == (g1 & 7), c1, 0.0)
        s2 = pl.multiple_of(g2 & (-8), 8)
        y_ref[pl.ds(s2, 8), :] += jnp.where(iota8 == (g2 & 7), c2, 0.0)


def _fused_kernel_dense(hi_ref, val_ref, route_ref, xq_ref, out_ref,
                        *, C: int, u1f: int, S: int = 1):
    """Dense-subsum variant for plans whose tiles span >2 groups (the
    nseg == 0 regime — small plans with tiny per-group budgets): the
    16 per-sub-block masked dynamic y updates of `_fused_kernel` (the
    measured ~39%/slot fallback overhead at 100k nnz) are replaced by
    ONE dense (16, 128) write of the sub-block sums per tile; the
    group accumulation happens outside the kernel as a one-hot f32
    matmul (exact sums, fixed tree) — sub-block rows are group-pure,
    so y[g] = sum of its sub-blocks' rows.

    Stacked plans (S > 1): sub-blocks are SUPER-group-pure, each slot
    tagged with its sub-row in route bits 7.. — the sub-block emits S
    masked sums (direct per-sub-row masked reduces, NOT total-minus-
    rest: subtraction cancels catastrophically across magnitude-skewed
    sub-rows), row (u·S + s) of the output."""
    xq = xq_ref[...]
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        route_r = route_ref[sl, :]
        routed = _routed_products(xq, hi_ref[sl, :], route_r,
                                  val_ref[sl, :], C, S)
        if S == 1:
            sums = [jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                            keepdims=True) for u in range(128 // SB)]
        else:
            sbit = (route_r.astype(jnp.int32) >> 7) & (S - 1)
            sums = []
            for u in range(128 // SB):
                blk = routed[u * SB:(u + 1) * SB, :]
                sb = sbit[u * SB:(u + 1) * SB, :]
                for s in range(S):
                    sums.append(jnp.sum(
                        jnp.where(sb == s, blk, 0.0), axis=0,
                        keepdims=True))
        nrow = (128 // SB) * S
        out_ref[j * nrow:(j + 1) * nrow, :] = jnp.concatenate(sums,
                                                              axis=0)


# matsum epilogue budget: the (G_pad, NSB) one-hot must stay small next
# to the table stream; past this, the legacy masked-update kernel runs
_MATSUM_MAX_ONEHOT = 1 << 22
# fused-epilogue gate: the (G_pad, 128) f32 y accumulator must fit VMEM
# comfortably next to the streamed table blocks
_MATSUM_FUSED_MAX_GPAD = 1024


def _fused_kernel_dense_y(hi_ref, val_ref, route_ref, oh_ref, xq_ref,
                          y_ref, *, C: int, u1f: int, S: int):
    """`_fused_kernel_dense` with the one-hot group-accumulation matmul
    fused in: each grid step contracts its (G_pad, u1f·16·S) one-hot
    slice against the step's sub-block sums on the MXU and accumulates
    into a resident (G_pad, 128) VMEM y — the separate XLA epilogue
    (one-hot build + dot + reshape) cost ~25% of the whole call at
    100k-nnz plans.  Per-step partial dots sum in a fixed order —
    deterministic per plan (a different tree than the unfused matsum,
    so not bitwise-comparable to it, same accuracy class).

    On-device coverage (ADVICE r4 item 2): the CPU interpret suite does
    not run Mosaic's block checks — v5e smoke jobs r5/004 (caught the
    S=1/S=2 multi-step 32/64-lane one-hot block, fixed by
    `_fused_matsum_u1f`) and r5/010 (green re-run incl. S ∈ {1,2,4,8}
    and the stacked small-NL path) are the recorded device validations;
    re-run the r5/010 smoke block after touching any BlockSpec here."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    step_rows = []
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        route_r = route_ref[sl, :]
        routed = _routed_products(xq, hi_ref[sl, :], route_r,
                                  val_ref[sl, :], C, S)
        if S == 1:
            sums = [jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                            keepdims=True) for u in range(128 // SB)]
        else:
            sbit = (route_r.astype(jnp.int32) >> 7) & (S - 1)
            sums = []
            for u in range(128 // SB):
                blk = routed[u * SB:(u + 1) * SB, :]
                sb = sbit[u * SB:(u + 1) * SB, :]
                for s in range(S):
                    sums.append(jnp.sum(
                        jnp.where(sb == s, blk, 0.0), axis=0,
                        keepdims=True))
        step_rows.extend(sums)
    sub = jnp.concatenate(step_rows, axis=0)   # (u1f*16*S, 128)
    y_ref[...] += jnp.dot(oh_ref[...], sub,
                          precision=lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)


def _seg2_padded_budgets(L_g, nnz: int):
    """Seg-aligned group budgets (lanes, multiples of SB) or None.

    Aligns budgets so no 128-lane-row tile spans more than TWO groups —
    then every tile's y updates collapse to 2 (prefix/suffix masked
    sums, the branch-free seg2 kernel).  Walk groups: if a group ends
    mid-tile and another group already ended in that tile, pad it to
    the tile end.  Accepted only when the added slack stays under
    SEG_PAD_FRAC and the slot caps; None ⇒ the caller keeps unpadded
    budgets (per-sub-block fallback / matsum reduce)."""
    TU = 128 // SB
    Lu = (np.asarray(L_g) // SB).astype(np.int64)
    Lp = Lu.copy()
    cum = 0
    last_t = -1
    for g in range(len(Lu) - 1):
        end = cum + int(Lp[g])
        if end % TU:
            t = end // TU
            if t == last_t:
                Lp[g] += TU - end % TU
                end = cum + int(Lp[g])
            else:
                last_t = t
        cum = end
    padded_slots = int(Lp.sum()) * SB * 128
    if (int(Lp.sum()) <= (1.0 + SEG_PAD_FRAC) * int(Lu.sum())
            and padded_slots <= 8 * max(nnz, 1)
            and padded_slots <= (1 << 27)):
        return Lp * SB
    return None


def _fused_matsum_u1f(NL: int, S: int, u1f: int, nsteps: int):
    """Mosaic-legal (u1f, nsteps) for the fused matsum kernel, or None.

    The fused kernel blocks the one-hot's LANE dim by u1f·(128/SB)·S
    columns per grid step; Mosaic requires that to be 128-divisible
    unless the block spans the whole array (single step).  At S ∈ {1, 2}
    with nsteps > 1 the natural u1f gives 32/64-lane blocks — the
    on-device failure v5e job r5/004 caught (the CPU interpret suite
    cannot: interpret mode skips Mosaic's block checks).  Raise u1f
    until the slice is legal; give up (caller uses the unfused epilogue)
    if the table's NL quantum can't support it."""
    while nsteps > 1 and (u1f * (128 // SB) * S) % 128:
        if u1f >= 8 or NL % (2 * u1f * 128):
            return None
        u1f *= 2
        nsteps = max(_ceil_div(NL, u1f * 128), 1)
    return u1f, nsteps


@functools.partial(memtrace.jit,
                   static_argnames=("plan_static", "interpret", "mode",
                                    "u1f_override"))
def _spmv_routed_call(hi_tbl, val_tbl, route_tbl, seg, r0s, x,
                      plan_static, interpret=False, mode="auto",
                      u1f_override=None):
    m, n, NL, nsteps1, nsteps2, R, C, nseg, S = plan_static
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = x.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate([xp, jnp.zeros((n_pad - n,), jnp.float32)])
    xq = jnp.tile(xp.reshape(C, 128, m128).transpose(0, 2, 1),
                  (1, R, 1)).reshape(C * 128, 128)

    G_pad = _round_up(_ceil_div(m, 128), 8)
    u1f = u1f_override if u1f_override is not None else _u1f_for(NL)
    while NL % (u1f * 128):   # stacked tables pad to a 512 quantum
        u1f //= 2
    nstepsf = max(_ceil_div(NL, u1f * 128), 1)
    nsb = NL // SB
    use_matsum = (S > 1 or mode in ("matsum", "matsum_unfused") or
                  (mode == "auto" and nseg == 0
                   and G_pad * nsb <= _MATSUM_MAX_ONEHOT))
    if use_matsum:
        # dense sub-block sums + one-hot matmul group accumulation
        # (stacked plans split each sub-block's sum by sub-row: S rows
        # per sub-block, see _fused_kernel_dense).
        # r0s is the (super-)group base row per sub-block (dead
        # sub-blocks point at the last group and contribute exact +0.0
        # rows); the one-hot rides the MXU — exact f32 sums in a fixed,
        # deterministic tree.  Stacked: output row (t·S + s) belongs to
        # group (r0s[t] >> 7) + s (past-the-end groups of a ragged tail
        # super-group match nothing — their subsums are exactly 0.0).
        base = r0s[:nsb] >> 7
        if S > 1:
            base = (base[:, None]
                    + jnp.arange(S, dtype=r0s.dtype)[None, :]).reshape(-1)
        onehot = (jnp.arange(G_pad, dtype=jnp.int32)[:, None]
                  == base[None, :]).astype(jnp.float32)
        fused = _fused_matsum_u1f(NL, S, u1f, nstepsf)
        if (fused is not None and G_pad <= _MATSUM_FUSED_MAX_GPAD
                and mode != "matsum_unfused"):
            u1f, nstepsf = fused
            # one kernel: the per-step one-hot contraction accumulates
            # into a resident VMEM y (the separate epilogue cost ~25%
            # of the call at 100k-nnz plans)
            nrow = u1f * (128 // SB) * S
            y = pl.pallas_call(
                functools.partial(_fused_kernel_dense_y, C=C, u1f=u1f,
                                  S=S),
                grid=(nstepsf,),
                in_specs=[
                    pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                    pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                    pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                    pl.BlockSpec((G_pad, nrow), lambda i: (0, i)),
                    pl.BlockSpec((C * 128, 128), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((G_pad, 128), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((G_pad, 128),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 2**20),
                interpret=interpret,
            )(hi_tbl, val_tbl, route_tbl, onehot, xq)
            return y.reshape(G_pad * 128)[:m]
        subsums = pl.pallas_call(
            functools.partial(_fused_kernel_dense, C=C, u1f=u1f, S=S),
            grid=(nstepsf,),
            in_specs=[
                pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
                pl.BlockSpec((C * 128, 128), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((u1f * (128 // SB) * S, 128),
                                   lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nsb * S, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 2**20),
            interpret=interpret,
        )(hi_tbl, val_tbl, route_tbl, xq)
        y = jnp.dot(onehot, subsums, precision=lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
        return y.reshape(G_pad * 128)[:m]
    if nseg == 2 and mode in ("auto", "seg"):
        sc = seg
        kern = functools.partial(_fused_kernel_seg, C=C, u1f=u1f)
    else:
        sc = r0s
        kern = functools.partial(_fused_kernel, C=C, u1f=u1f)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstepsf,),
        in_specs=[
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((C * 128, 128), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, 128), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(sc, hi_tbl, val_tbl, route_tbl, xq)
    return y.reshape(G_pad * 128)[:m]


def spmv_routed(x, plan: SpmvRoutedPlan, interpret: bool = False,
                mode: str = "auto", u1f_override=None):
    """y = A @ x for the fixed structure/values captured in `plan`.

    `mode`/`u1f_override` select the reduce kernel explicitly (A/B
    probes and tests): "auto" = seg2 boundary-split when the plan
    guarantees <= 2 group segments per tile, dense-subsum + one-hot
    matmul ("matsum") otherwise, legacy per-sub-block masked updates
    ("fallback") past the matsum one-hot budget.  Stacked plans
    (plan.S > 1) always reduce via the sub-row-split matsum path."""
    nseg = plan.nseg if plan.seg_tbl is not None else 0
    S = getattr(plan, "S", 1)
    if S > 1 and mode not in ("auto", "matsum", "matsum_unfused"):
        raise ValueError(f"stacked plans (S={S}) support only the "
                         f"matsum reduce, not mode={mode!r}")
    ps = (plan.m, plan.n, plan.NL, plan.nsteps1, plan.nsteps2,
          plan.R, plan.C, nseg, S)
    seg = plan.seg_tbl if nseg == 2 else plan.r0s
    return _spmv_routed_call(plan.hi_tbl, plan.val_tbl, plan.route_tbl,
                             seg, plan.r0s, x, ps, interpret, mode,
                             u1f_override)


# ===========================================================================
# multi-vector (SpMM) execution over the same plan: the routing tables
# are structure-only, so KB columns of X ride one table stream
# ===========================================================================

KB = 8           # columns per kernel pass
U1M = 2          # kernel-1 tiles per grid step (out block = U1M*KB*64KB)


def _gather_route_kernel_m(hi_ref, val_ref, route_ref, xq_ref, out_ref,
                           *, C: int):
    """Multi-column gather+route: xq_ref stacks KB column tiles
    ((KB*C*128, 128)); column c's routed products land in out lanes
    [c*128, (c+1)*128).  Same routed-value layout as the fused SpMV
    kernel (dead slots multiply by 0.0, no masks)."""
    xq = xq_ref[...]
    for j in range(U1M):
        sl = slice(j * 128, (j + 1) * 128)
        hi = hi_ref[sl, :]
        idx = hi.astype(jnp.int32)
        if C > 1:
            idx = idx & 127
        val_r = val_ref[sl, :]
        r = route_ref[sl, :].astype(jnp.int32)
        for c in range(KB):
            base = c * C * 128
            xv = jnp.take_along_axis(xq[base:base + 128, :], idx, axis=1)
            for t in range(1, C):
                xt = jnp.take_along_axis(
                    xq[base + t * 128:base + (t + 1) * 128, :], idx,
                    axis=1)
                xv = jnp.where((hi.astype(jnp.int32) >> 7) == t, xt, xv)
            out_ref[sl, c * 128:(c + 1) * 128] = val_r * \
                jnp.take_along_axis(xv.T, r, axis=1)


def _sum_kernel_m(r0s_ref, z_ref, y_ref):
    """Sublane sums of group-pure SB-row sub-blocks, KB columns wide."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    z = z_ref[...]                              # (U2*SB, KB*128)
    iota8 = lax.broadcasted_iota(jnp.int32, (8, KB * 128), 0)
    for u in range(U2):
        blk = z[u * SB:(u + 1) * SB, :]
        y_win = jnp.sum(blk, axis=0, keepdims=True)
        g = r0s_ref[i * U2 + u] >> 7
        s = pl.multiple_of(g & (-8), 8)
        y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
        y_ref[pl.ds(s, 8), :] += y8


@functools.partial(memtrace.jit, static_argnames=("plan_static", "interpret"))
def _spmm_routed_call(hi_tbl, val_tbl, route_tbl, r0s, xb,
                      plan_static, interpret=False):
    """Y[:, :KB] = A @ xb for one KB-column block (xb: (n, KB) f32)."""
    m, n, NL, _, nsteps2, R, C = plan_static
    nsteps1m = max(_ceil_div(NL, U1M * 128), 1)
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = xb.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n_pad - n, KB), jnp.float32)], axis=0)
    # (KB, C, m128, 128) -> repeat classes R times -> (KB*C*128, 128)
    xq = jnp.tile(xp.T.reshape(KB, C, 128, m128).transpose(0, 1, 3, 2),
                  (1, 1, R, 1)).reshape(KB * C * 128, 128)

    z = pl.pallas_call(
        functools.partial(_gather_route_kernel_m, C=C),
        grid=(nsteps1m,),
        in_specs=[
            pl.BlockSpec((U1M * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((U1M * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((U1M * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((KB * C * 128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((U1M * 128, KB * 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(
            (nsteps1m * U1M * 128, KB * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(hi_tbl, val_tbl, route_tbl, xq)

    G_pad = _round_up(_ceil_div(m, 128), 8)
    NL2 = nsteps2 * SB * U2
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps2,),
        in_specs=[pl.BlockSpec((SB * U2, KB * 128), lambda i, r: (i, 0))],
        out_specs=pl.BlockSpec((G_pad, KB * 128), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        _sum_kernel_m,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, KB * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(r0s, z[:NL2])
    # (G_pad, KB, 128) -> (m, KB)
    yk = y.reshape(G_pad, KB, 128).transpose(1, 0, 2).reshape(
        KB, G_pad * 128)[:, :m]
    return yk.T


def _fused_kernel_seg_m(seg_ref, hi_ref, valr_ref, route_ref, xq_ref,
                        y_ref, *, C: int, u1f: int):
    """Fused KB-column variant of `_fused_kernel_seg`: the z intermediate
    of the two-kernel path (8 HBM bytes per slot·column write+read —
    dominant at extreme sparsity, VERDICT r2 weak-8) never exists; the
    (G_pad, KB·128) accumulator lives in VMEM and the boundary-split
    updates cover all KB columns at once.  Same segment-word packing
    as `_fused_kernel_seg` (explicit g1/g2), branch-free."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    iota8 = lax.broadcasted_iota(jnp.int32, (8, KB * 128), 0)
    iota128 = lax.broadcasted_iota(jnp.int32, (128, KB * 128), 0)
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        hi = hi_ref[sl, :]
        idx = hi.astype(jnp.int32)
        if C > 1:
            idx = idx & 127
        val_r = valr_ref[sl, :]
        r = route_ref[sl, :].astype(jnp.int32)
        cols = []
        for c in range(KB):
            base = c * C * 128
            xv = jnp.take_along_axis(xq[base:base + 128, :], idx, axis=1)
            for t in range(1, C):
                xt = jnp.take_along_axis(
                    xq[base + t * 128:base + (t + 1) * 128, :], idx,
                    axis=1)
                xv = jnp.where((hi.astype(jnp.int32) >> 7) == t, xt, xv)
            cols.append(val_r * jnp.take_along_axis(xv.T, r, axis=1))
        routed = jnp.concatenate(cols, axis=1)       # (128, KB*128)
        w = seg_ref[i * u1f + j]
        g1 = w >> 18
        g2 = (w >> 5) & 0x1FFF
        b8 = (w & 31) * SB
        c1 = jnp.sum(jnp.where(iota128 < b8, routed, 0.0), axis=0,
                     keepdims=True)
        c2 = jnp.sum(jnp.where(iota128 >= b8, routed, 0.0), axis=0,
                     keepdims=True)
        s1 = pl.multiple_of(g1 & (-8), 8)
        y_ref[pl.ds(s1, 8), :] += jnp.where(iota8 == (g1 & 7), c1, 0.0)
        s2 = pl.multiple_of(g2 & (-8), 8)
        y_ref[pl.ds(s2, 8), :] += jnp.where(iota8 == (g2 & 7), c2, 0.0)


def _fused_kernel_dense_m(hi_ref, valr_ref, route_ref, xq_ref, out_ref,
                          *, C: int, u1f: int, S: int = 1):
    """KB-column variant of `_fused_kernel_dense` for nseg == 0 plans:
    dense (16·S, KB·128) sub-block-sum writes per tile — the z
    intermediate (2·KB·512 HBM bytes per lane-row, dominant at extreme
    sparsity) shrinks 8× to sub-block granularity, and the group
    accumulation rides the one-hot MXU matmul outside.  Stacked plans
    (S > 1) split each sub-block's sums by the route-tagged sub-row."""
    xq = xq_ref[...]
    for j in range(u1f):
        sl = slice(j * 128, (j + 1) * 128)
        hi = hi_ref[sl, :]
        idx = hi.astype(jnp.int32)
        if C > 1:
            idx = idx & 127
        val_r = valr_ref[sl, :]
        r = route_ref[sl, :].astype(jnp.int32)
        if S > 1:
            sbit1 = (r >> 7) & (S - 1)
            r = r & 127
        cols = []
        for c in range(KB):
            base = c * C * 128
            xv = jnp.take_along_axis(xq[base:base + 128, :], idx, axis=1)
            for t in range(1, C):
                xt = jnp.take_along_axis(
                    xq[base + t * 128:base + (t + 1) * 128, :], idx,
                    axis=1)
                xv = jnp.where((hi.astype(jnp.int32) >> 7) == t, xt, xv)
            cols.append(val_r * jnp.take_along_axis(xv.T, r, axis=1))
        routed = jnp.concatenate(cols, axis=1)       # (128, KB*128)
        if S == 1:
            sums = [jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                            keepdims=True) for u in range(128 // SB)]
        else:
            sbit = jnp.tile(sbit1, (1, KB))          # (128, KB*128)
            sums = []
            for u in range(128 // SB):
                blk = routed[u * SB:(u + 1) * SB, :]
                sb = sbit[u * SB:(u + 1) * SB, :]
                for s in range(S):
                    sums.append(jnp.sum(
                        jnp.where(sb == s, blk, 0.0), axis=0,
                        keepdims=True))
        nrow = (128 // SB) * S
        out_ref[j * nrow:(j + 1) * nrow, :] = jnp.concatenate(sums,
                                                              axis=0)


@functools.partial(memtrace.jit, static_argnames=("plan_static", "interpret"))
def _spmm_routed_call_matsum(hi_tbl, val_tbl, route_tbl, r0s, xb,
                             plan_static, interpret=False):
    """Fused one-kernel KB-column block for nseg == 0 plans: dense
    sub-block sums + one-hot matmul (the SpMM twin of the SpMV matsum
    path; stacked plans split sums by sub-row, S rows per sub-block)."""
    m, n, NL, R, C, S = plan_static
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = xb.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n_pad - n, KB), jnp.float32)], axis=0)
    xq = jnp.tile(xp.T.reshape(KB, C, 128, m128).transpose(0, 1, 3, 2),
                  (1, 1, R, 1)).reshape(KB * C * 128, 128)
    G_pad = _round_up(_ceil_div(m, 128), 8)
    u1f = _u1f_for(NL)
    while NL % (u1f * 128):   # stacked tables pad to a 512 quantum
        u1f //= 2
    nstepsf = max(_ceil_div(NL, u1f * 128), 1)
    nsb = NL // SB
    subsums = pl.pallas_call(
        functools.partial(_fused_kernel_dense_m, C=C, u1f=u1f, S=S),
        grid=(nstepsf,),
        in_specs=[
            pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((KB * C * 128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((u1f * (128 // SB) * S, KB * 128),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nsb * S, KB * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(hi_tbl, val_tbl, route_tbl, xq)
    base = r0s[:nsb] >> 7
    if S > 1:
        base = (base[:, None]
                + jnp.arange(S, dtype=r0s.dtype)[None, :]).reshape(-1)
    onehot = (jnp.arange(G_pad, dtype=jnp.int32)[:, None]
              == base[None, :]).astype(jnp.float32)
    y = jnp.dot(onehot, subsums, precision=lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
    yk = y.reshape(G_pad, KB, 128).transpose(1, 0, 2).reshape(
        KB, G_pad * 128)[:, :m]
    return yk.T


@functools.partial(memtrace.jit, static_argnames=("plan_static", "interpret"))
def _spmm_routed_call_fused(hi_tbl, val_tbl, route_tbl, seg, xb,
                            plan_static, interpret=False):
    """Fused one-kernel KB-column block (requires a seg2 plan)."""
    m, n, NL, R, C = plan_static
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = xb.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate(
            [xp, jnp.zeros((n_pad - n, KB), jnp.float32)], axis=0)
    xq = jnp.tile(xp.T.reshape(KB, C, 128, m128).transpose(0, 1, 3, 2),
                  (1, 1, R, 1)).reshape(KB * C * 128, 128)
    G_pad = _round_up(_ceil_div(m, 128), 8)
    u1f = _u1f_for(NL)
    nstepsf = max(_ceil_div(NL, u1f * 128), 1)
    kern = functools.partial(_fused_kernel_seg_m, C=C, u1f=u1f)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstepsf,),
        in_specs=[
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((u1f * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((KB * C * 128, 128), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, KB * 128), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        kern, grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, KB * 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 2**20),
        interpret=interpret,
    )(seg, hi_tbl, val_tbl, route_tbl, xq)
    yk = y.reshape(G_pad, KB, 128).transpose(1, 0, 2).reshape(
        KB, G_pad * 128)[:, :m]
    return yk.T


def spmm_routed(x, plan: SpmvRoutedPlan, interpret: bool = False):
    """Y = A @ X for dense X (n, k) over the fixed-structure plan —
    the cuSPARSE SpMM analogue (cusparse.py:1440-1514) at SpMV's
    per-entry cost: the routing tables stream once per KB-column block
    instead of once per column.  seg2 plans take the fused one-kernel
    path (no z intermediate); others fall back to gather+route / sum."""
    n, k = x.shape
    k_pad = _round_up(max(k, 1), KB)
    if k_pad != k:
        x = jnp.concatenate(
            [x, jnp.zeros((n, k_pad - k), x.dtype)], axis=1)
    S = getattr(plan, "S", 1)
    fused = S == 1 and plan.nseg == 2 and plan.seg_tbl is not None
    G_pad = _round_up(_ceil_div(plan.m, 128), 8)
    matsum = (not fused
              and (S > 1
                   or G_pad * (plan.NL // SB) <= _MATSUM_MAX_ONEHOT))
    outs = []
    for b in range(k_pad // KB):
        xb = x[:, b * KB:(b + 1) * KB]
        if fused:
            ps = (plan.m, plan.n, plan.NL, plan.R, plan.C)
            outs.append(_spmm_routed_call_fused(
                plan.hi_tbl, plan.val_tbl, plan.route_tbl, plan.seg_tbl,
                xb, ps, interpret))
        elif matsum:
            ps = (plan.m, plan.n, plan.NL, plan.R, plan.C, S)
            outs.append(_spmm_routed_call_matsum(
                plan.hi_tbl, plan.val_tbl, plan.route_tbl, plan.r0s,
                xb, ps, interpret))
        else:
            ps = (plan.m, plan.n, plan.NL, plan.nsteps1, plan.nsteps2,
                  plan.R, plan.C)
            outs.append(_spmm_routed_call(
                plan.hi_tbl, plan.val_tbl, plan.route_tbl, plan.r0s,
                xb, ps, interpret))
    y = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)
    return y[:, :k]
