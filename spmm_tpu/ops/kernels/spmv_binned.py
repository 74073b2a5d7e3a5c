"""Pallas TPU SpMV: binned lane-gather + windowed masked-select reduce.

The fixed-structure (preprocess-and-reuse) SpMV — the TPU analogue of
cuSPARSE's SpMV descriptor analysis phase (/root/reference
modify_src/cupy-src/cupyx/cusparse.py:1373-1438 creates dn/sp
descriptors and a sized work buffer once, then `spmv` reuses them).

Why two kernels (measured on v5e, benchmarks/spmv_lab{3,4}.py):
  * Mosaic's same-shape lane gather (`take_along_axis` axis=1 at
    (128, 128)) moves x values at ~0.01 ns/slot — 150x cheaper than the
    one-hot MXU gather of kernels/spmv_onehot (~1.8 ns/entry).  It
    requires the entry's column class (col mod 128/R) to match its VMEM
    sublane, so entries are pre-binned by class — a host-side plan.
  * The windowed masked-select reduce needs entries packed along
    sublanes with a shared 128-row window per sub-chunk, i.e.
    row-group-major order.  The two layouts meet through one cheap XLA
    transpose of the product stream.

Layout.  Rows are cut into groups of 128.  Within a group, entries are
binned by class = col mod (128/R); a bin owns the R sublanes
{class + j*128/R} (the x tile repeats each class's values R times along
sublanes, so any of the R sublanes serves any column of the class —
R > 1 shrinks the Poisson max-of-bins padding that dominates slack when
bins are thin); bin ranks are dealt round-robin over the R sublanes and
index LANES.  Each group occupies L_g lanes (its max bin size / R,
padded to the reduce sub-chunk's lane granularity), groups pack densely
along the global lane axis.  Kernel 1 gathers x (resident as C stacked
(128, 128) tiles: sublane = class (repeated R times), lane + 128*tile
= q = col div (128/R); hence n <= C*16384/R, C <= 8) with one
take_along_axis per tile (plus a select chain over the C tiles),
multiplies by the pre-binned
values, transposes, and streams products out lane-major.  An XLA
transpose repacks them into the (CH, U) sub-chunk-per-lane layout, and
kernel 2 masked-selects each product into its row's LANE of the 128-row
group window anchored at the sub-chunk's group base (sub-chunks are
group-pure by construction) and sums over sublanes into a lane-major
(G, 128) accumulator — pure full-width VPU work, no MXU.

Exactness: x values travel bitwise through the gather (no bf16 gather
triple needed — better than spmv_onehot), products are val * x[col] in
f32, and the reduction is an exact f32 sum in a fixed plan+compiler
determined tree order — deterministic across runs, and strictly more
accurate than spmv_onehot's bf16-triple dots.

Dead slots (bin padding) carry val = 0, row = 0 and accumulate +0.0
into their group's base row.

Rejected variant (measured on v5e): factoring the window one-hot as
row = 8a + b and doing ONE (CH,16)x(CH,24) dot per sub-chunk into a
2-D y accumulator is ~1.8x SLOWER than the three skinny (CH,128)x(CH,1)
dots (0.43 vs 0.76 Gnnz/s at 10k/0.01) — the narrow-lane (CH,8/16/24)
operands pad to 128 lanes and the concatenate adds lane shuffles.
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

U1 = 8          # kernel-1 tiles per grid step
U2 = 16         # kernel-2 sub-chunks per grid step


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _ceil_div(x, m):
    return -(-x // m)


class SpmvBinnedPlan(NamedTuple):
    m: int
    n: int
    CH: int              # reduce sub-chunk length (entries)
    NL: int              # total lanes (slots = NL * 128)
    nsteps1: int
    nsteps2: int
    R: int               # sublane replication: R sublanes per col class
    C: int               # x-table column tiles (n <= C * 16384 / R)
    hi_tbl: jnp.ndarray   # (NL, 128) i32 — gather index q per slot
    val_tbl: jnp.ndarray  # (NL, 128) f32 — pre-binned values (0 = dead)
    rows_pk: jnp.ndarray  # (nsteps2*CH, U2) i8 — group-relative rows,
    #                       packed sub-chunk-per-lane
    r0s: jnp.ndarray      # (nsteps2*U2,) i32 — group base row per
    #                       sub-chunk (multiple of 128)


_C_MAX = 8               # max x-table tiles (gathers per slot tile)


def spmv_binned_plan(indptr_host, indices_host, data_host,
                     m: int, n: int) -> Optional[SpmvBinnedPlan]:
    """Host-side analysis: bin entries by (row group, col class) and
    build the gather/value/row tables.

    A column class is col mod (128/R); the R sublanes {class + j*128/R}
    all serve it (the x tile replicates each class's values R times
    along sublanes), so per-(group, class) bin skew — the Poisson
    max-of-bins padding that dominates slack at low nnz/group — shrinks
    as bins widen.  C column tiles extend the reachable n to
    C*16384/R (the gather selects between C tiles per slot).  (R, C,
    CH) are chosen jointly to minimise padded slots + per-step costs.

    Returns None when the kernel does not apply (empty, n too wide for
    every (R, C) candidate, or pathological skew)."""
    indptr = np.asarray(indptr_host)
    indices = np.asarray(indices_host, np.int64)
    data = np.asarray(data_host)
    nnz = int(indptr[-1])
    if nnz == 0 or m <= 0 or n > _C_MAX * 128 * 128:
        return None

    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr))
    gr = rows >> 7
    ngroups = -(-m // 128)

    # joint (R, CH) search: exact padded-slot count per candidate, plus
    # per-grid-step fixed costs in slot-equivalents (~2.5 us/step at
    # ~0.45 ns/slot) and a small per-extra-tile gather penalty
    best = None
    for CH_c in (1024, 2048, 4096):
        gran = CH_c // 128
        for R_c in (1, 2, 4, 8):
            m128 = 128 // R_c
            C_c = max(1, _ceil_div(_ceil_div(n, m128), 128))
            if C_c > _C_MAX:
                continue
            cls = indices % m128
            cnt = np.bincount(gr * m128 + cls, minlength=ngroups * m128)
            maxbin = cnt.reshape(ngroups, m128).max(axis=1)
            L_gc = np.maximum(
                gran, _ceil_div(_ceil_div(maxbin, R_c), gran) * gran)
            slots_c = int(L_gc.sum()) * 128
            lanes_step2 = CH_c * U2 // 128
            ns2 = -(-_round_up(int(L_gc.sum()), 128) // lanes_step2)
            ns1 = -(-_round_up(int(L_gc.sum()), 128) // (U1 * 128))
            cost = (slots_c * (1.0 + 0.03 * (C_c - 1))
                    + (ns1 + ns2) * 5500)
            if best is None or cost < best[0]:
                best = (cost, R_c, C_c, CH_c, gran)
    if best is None:
        return None
    _, R, C, CH, lane_gran = best
    m128 = 128 // R

    cls = indices % m128                  # column class (sublane group)
    q = indices // m128                   # gather index within class
    key = gr * m128 + cls
    counts = np.bincount(key, minlength=ngroups * m128)
    maxbin = counts.reshape(ngroups, m128).max(axis=1)
    L_g = np.maximum(
        lane_gran, _ceil_div(_ceil_div(maxbin, R), lane_gran) * lane_gran)
    slots = int(L_g.sum()) * 128
    if slots > 8 * max(nnz, 1) or slots > (1 << 27):
        return None  # pathological class skew — fall back

    lane_base = np.zeros(ngroups + 1, np.int64)
    np.cumsum(L_g, out=lane_base[1:])
    NL = _round_up(int(lane_base[-1]), 128)
    nsteps1 = -(-NL // (U1 * 128)) if NL else 1
    NL1 = nsteps1 * U1 * 128          # kernel-1 padded lanes
    # kernel-2 consumes NL in (128-lane) steps of CH*U2 entries
    lanes_per_step2 = CH * U2 // 128
    nsteps2 = -(-NL // lanes_per_step2)
    NL2 = nsteps2 * lanes_per_step2
    NLP = max(NL1, NL2)

    # rank within (group, class) bin, preserving CSR order
    order = np.argsort(key, kind="stable")
    ranks = np.empty(nnz, np.int64)
    arange = np.arange(nnz, dtype=np.int64)
    seg_start = np.zeros(ngroups * m128 + 1, np.int64)
    np.cumsum(counts, out=seg_start[1:])
    ranks[order] = arange - seg_start[key[order]]

    # deal each bin's entries round-robin over its R sublanes
    sub = cls + (ranks % R) * m128        # sublane per entry
    lane = lane_base[gr] + ranks // R     # global lane per entry
    tile = lane >> 7
    ll = lane & 127

    hi_tbl = np.zeros((NLP * 128,), np.int32)
    val_tbl = np.zeros((NLP * 128,), np.float32)
    rows_rel = np.zeros((NLP, 128), np.int8)
    flat_g = (tile * 128 + sub) * 128 + ll  # (tile, sublane, lane)
    hi_tbl[flat_g] = q
    val_tbl[flat_g] = data.astype(np.float32)
    rows_rel[lane, sub] = (rows & 127).astype(np.int8)

    # pack rows into the (CH, U2) sub-chunk-per-lane layout the reduce
    # kernel streams: sub-chunk u of step i covers lanes
    # [i*lps + u*(CH//128), ...), entries lane-major (lane, lo)
    lpc = CH // 128                        # lanes per sub-chunk
    rows_pk = (rows_rel[:NL2]
               .reshape(nsteps2, U2, lpc * 128)
               .transpose(0, 2, 1)
               .reshape(nsteps2 * CH, U2))

    # group base per sub-chunk (sub-chunks are group-pure: L_g is a
    # multiple of lane_gran = lpc)
    first_lane = np.arange(nsteps2 * U2, dtype=np.int64) * lpc
    grp = np.searchsorted(lane_base[1:], first_lane, side="right")
    grp = np.minimum(grp, ngroups - 1)
    r0s = (grp * 128).astype(np.int32)

    return SpmvBinnedPlan(
        m=m, n=n, CH=CH, NL=NLP, nsteps1=nsteps1, nsteps2=nsteps2,
        R=R, C=C,
        hi_tbl=jnp.asarray(hi_tbl.reshape(NLP, 128)),
        val_tbl=jnp.asarray(val_tbl.reshape(NLP, 128)),
        rows_pk=jnp.asarray(rows_pk),
        r0s=jnp.asarray(r0s))


def _gather_kernel(hi_ref, val_ref, xq_ref, out_ref, *, C: int = 1):
    """Per slot tile: lane-gather x from C stacked (128, 128) x tiles
    (tile t = q in [128t, 128(t+1))), select by q >> 7."""
    xq = xq_ref[...]
    for j in range(U1):
        sl = slice(j * 128, (j + 1) * 128)
        hi = hi_ref[sl, :]
        idx = hi & 127
        xv = jnp.take_along_axis(xq[0:128, :], idx, axis=1)
        for t in range(1, C):
            xt = jnp.take_along_axis(xq[t * 128:(t + 1) * 128, :], idx,
                                     axis=1)
            xv = jnp.where((hi >> 7) == t, xt, xv)
        out_ref[sl, :] = (val_ref[sl, :] * xv).T


def _reduce_kernel(r0s_ref, rows_ref, z_ref, y_ref, *, CH: int):
    """Masked-select f32 windowed reduce into a lane-major (G_pad, 128)
    y accumulator: per sub-chunk, select each product into its row's
    LANE of the 128-row group window and sum over sublanes — pure VPU,
    exact f32, fixed reduction tree (deterministic).  Measured ~2x the
    bf16-triple one-hot MXU dots it replaced (1.52 vs 0.76 Gnnz/s at
    10k/0.01 on v5e): the (CH,128) select+sum is full-width vector work
    while the skinny (CH,1) dot operands wasted 127/128 lanes."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    z = z_ref[...]                                   # (CH, U2) f32
    rw = rows_ref[...].astype(jnp.int32)             # (CH, U2)
    iota = lax.broadcasted_iota(jnp.int32, (CH, 128), 1)
    iota8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for u in range(U2):
        mz = jnp.where(rw[:, u:u + 1] == iota, z[:, u:u + 1], 0.0)
        y_win = jnp.sum(mz, axis=0, keepdims=True)   # (1, 128)
        g = r0s_ref[i * U2 + u] >> 7                 # group index
        s = pl.multiple_of(g & (-8), 8)
        y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
        y_ref[pl.ds(s, 8), :] += y8


@functools.partial(memtrace.jit, static_argnames=("plan_static", "interpret"))
def _spmv_binned_call(hi_tbl, val_tbl, rows_pk, r0s, x,
                      plan_static, interpret=False):
    m, n, CH, NL, nsteps1, nsteps2, R, C = plan_static
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = x.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate([xp, jnp.zeros((n_pad - n,), jnp.float32)])
    # x tile t, sublane s, lane h holds x[(h + 128 t) * m128 + s % m128]
    xq = jnp.tile(xp.reshape(C, 128, m128).transpose(0, 2, 1),
                  (1, R, 1)).reshape(C * 128, 128)

    prod = pl.pallas_call(
        functools.partial(_gather_kernel, C=C),
        grid=(nsteps1,),
        in_specs=[
            pl.BlockSpec((U1 * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((U1 * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((C * 128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((U1 * 128, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nsteps1 * U1 * 128, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(hi_tbl, val_tbl, xq)

    # repack lane-major products into the (CH, U2) sub-chunk-per-lane
    # layout (one XLA transpose)
    lpc = CH // 128
    NL2 = nsteps2 * CH * U2 // 128
    z_pk = (prod[:NL2]
            .reshape(nsteps2, U2, lpc * 128)
            .transpose(0, 2, 1)
            .reshape(nsteps2 * CH, U2))

    G_pad = _round_up(-(-m // 128), 8)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps2,),
        in_specs=[
            pl.BlockSpec((CH, U2), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U2), lambda i, r: (i, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, 128), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_reduce_kernel, CH=CH),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(r0s, rows_pk, z_pk)
    return y.reshape(G_pad * 128)[:m]


def spmv_binned(x, plan: SpmvBinnedPlan, interpret: bool = False):
    """y = A @ x for the fixed structure/values captured in `plan`."""
    ps = (plan.m, plan.n, plan.CH, plan.NL, plan.nsteps1, plan.nsteps2,
          plan.R, plan.C)
    return _spmv_binned_call(plan.hi_tbl, plan.val_tbl, plan.rows_pk,
                             plan.r0s, x, ps, interpret)
