"""Pallas TPU kernels: routed monotone data movement for fixed structures.

The serving-path replacement for both densify (CSR -> dense) and dense
extraction (dense -> CSR values) when the sparsity STRUCTURE is fixed and
only values change per call — the cuSPARSE preprocess-and-reuse pattern
(/root/reference modify_src/cupy-src/cupyx/cusparse.py:2007-2142 sizes
descriptors/buffers once and reuses them; here the analogue is a static
routing plan).

Key fact (measured, BENCH_SUMMARY round 2): Mosaic's lane gather
(`take_along_axis` axis=1) and 2-D transpose cost ~nothing on top of the
HBM stream, while one-hot MXU placement costs ~1.5 ns/entry and XLA
scatter ~6 ns/entry.  So any *static* placement should be routed with
precomputed index tables, not computed with one-hots.

Monotone routing theorem (used by both kernels): let g be a monotone map
between flat source positions and flat dest positions (densify inserts
zeros, extraction deletes them — both monotone).  Tile the dest into
(B, 128) blocks.  Each dest row (128 consecutive dest slots) pulls from
<=128 *consecutive* source positions, whose lane residues (pos & 127) are
therefore DISTINCT.  Hence the whole block maps as

    out = T( gather_lanes( T( gather_lanes(src, I1) ), I2 ) )

with two static lane-gathers and (depending on direction) two cheap 2-D
transposes — no scatter, no one-hot, no MXU.  The index tables I1/I2 are
built once on the host from the structure; per call the kernel only
streams values + one packed i32 table per dest cell.

Mosaic constraint: `take_along_axis` lowers only when the index array has
exactly the operand's shape, so both gathers run at (128, 128) — the
source slice is always 128 rows and the tables are padded to 128 lanes;
the B live columns are sliced out after the gather.

Exactness: pure data movement — output values are bitwise the input
values; empty cells are written as +0.0 (matching `jnp.zeros`); the
structural pattern is emitted from the static flag bit, so explicit
zeros stay structural with no _TINY marker games at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

from spmm_tpu.utils import memtrace

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32

# resident-source VMEM gates (bytes)
_EXPAND_SRC_BUDGET = 8 * 2**20
_COMPRESS_SRC_BUDGET = 24 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class ExpandPlan(NamedTuple):
    """Static routing plan: CSR values -> dense (m, k) + bf16 pattern."""
    m: int
    k: int
    B: int          # dest rows per block of the (m*k/128, 128) layout
    S_SRC: int      # always 128: source rows sliced per block
    U: int          # blocks per grid step
    NBLK: int       # padded number of blocks (multiple of U)
    NV: int         # padded source rows (vals padded to NV*128 elements)
    rows0: jnp.ndarray   # (NBLK,) i32 aligned source-row base per block
    pkA: jnp.ndarray     # (NBLK*128, 128) i32: stage-1 table u(l, b)
    pkB: jnp.ndarray     # (NBLK*B, 128) i32: stage-2 table l | flag<<7


class CompressPlan(NamedTuple):
    """Static routing plan: dense (m, n) -> CSR values, + static
    indices/indptr of the fixed output structure."""
    m: int
    n: int
    cap: int
    B: int          # dest rows per block of the (cap_pad/128, 128) layout
    S_D: int        # always 128: source rows sliced per block
    U: int
    NBLK: int
    RT_PAD: int     # padded dense rows the kernel may read
    rows0: jnp.ndarray   # (NBLK,) i32
    pkA: jnp.ndarray     # (NBLK*128, 128) i32: stage-1 table l_src(u, lam)
    pkB: jnp.ndarray     # (NBLK*128, 128) i32: stage-2 table u(lam, b)
    indptr: jnp.ndarray  # (m+1,) i32 — static output structure
    indices: jnp.ndarray  # (cap,) i32


def expand_route_plan(indptr_host, indices_host, m: int, k: int,
                      unroll: int = 8) -> Optional[ExpandPlan]:
    """Build the static densify routing tables from a host copy of the
    structure, or None when the kernel does not apply."""
    indptr_host = np.asarray(indptr_host)
    indices_host = np.asarray(indices_host)
    nnz = int(indptr_host[-1])
    if m * k % 128 != 0:
        return None
    rtot = m * k // 128
    rows = np.repeat(np.arange(m, dtype=np.int64), np.diff(indptr_host))
    f = rows * k + indices_host.astype(np.int64)
    rt = f >> 7
    d = (f & 127).astype(np.int64)
    e = np.arange(nnz, dtype=np.int64)

    for B in (128, 64, 32, 16, 8):
        nblk = -(-rtot // B)
        blk = rt // B
        e0 = np.searchsorted(blk, np.arange(nblk), side="left")
        e1 = np.searchsorted(blk, np.arange(nblk), side="right")
        base = (e0 >> 10) << 10
        s_need = -(-(e1 - base) // 128)
        if int(s_need.max(initial=1)) <= 128:
            break
    else:
        return None

    nv = _round_up(max(1, -(-nnz // 128)), 8) + 128
    if nv * 128 * 4 > _EXPAND_SRC_BUDGET:
        return None
    u_units = min(unroll, nblk)
    nblkp = _round_up(nblk, u_units)

    b_loc = rt % B
    pos_rel = e - base[blk]
    uu = (pos_rel >> 7).astype(np.int32)
    ll = (pos_rel & 127).astype(np.int32)

    # stage-1 table padded to 128 lanes (Mosaic same-shape gather)
    U_t = np.zeros((nblkp, 128, 128), np.int32)
    LF_t = np.full((nblkp, B, 128), 1 << 7, np.int32)  # flag=1 everywhere
    U_t[blk, ll, b_loc] = uu
    LF_t[blk, b_loc, d] = ll  # flag bit cleared for kept cells

    rows0 = np.zeros((nblkp,), np.int32)
    rows0[:nblk] = (base >> 7).astype(np.int32)

    return ExpandPlan(
        m=m, k=k, B=B, S_SRC=128, U=u_units, NBLK=nblkp, NV=nv,
        rows0=jnp.asarray(rows0),
        pkA=jnp.asarray(U_t.reshape(nblkp * 128, 128)),
        pkB=jnp.asarray(LF_t.reshape(nblkp * B, 128)))


def compress_route_plan(mask_host, n: int,
                        unroll: int = 8) -> Optional[CompressPlan]:
    """Build the static extraction routing tables from a host copy of the
    output mask (m, n), or None when the kernel does not apply (e.g.
    ultra-sparse masks where one 128-entry dest block spans more than 128
    source rows — callers fall back to a static-index gather)."""
    mask_host = np.asarray(mask_host)
    m = mask_host.shape[0]
    if m * n % 128 != 0:
        return None
    rtot = m * n // 128
    flat = mask_host.ravel()
    f = np.flatnonzero(flat).astype(np.int64)
    cap = int(f.size)
    if cap == 0:
        return None
    r = np.arange(cap, dtype=np.int64)

    # B < 8 (sparse masks) is fine: the kernel concatenates the U
    # per-block (B, 128) slices and issues one aligned (U*B, 128) store.
    for B in (128, 64, 32, 16, 8, 4, 2, 1):
        ob = r // (B * 128)
        nblk = int(ob[-1]) + 1
        r0 = np.searchsorted(ob, np.arange(nblk), side="left")
        r1 = np.searchsorted(ob, np.arange(nblk), side="right")
        base = (f[r0] >> 10) << 10
        s_need = -(-(f[r1 - 1] + 1 - base) // 128)
        if int(s_need.max(initial=1)) <= 128:
            break
    else:
        return None

    rt_pad = int((base[-1] >> 7) + 128)
    rt_pad = max(rt_pad, rtot)
    if rt_pad * 128 * 4 > _COMPRESS_SRC_BUDGET:
        return None
    u_units = max(min(unroll, nblk), -(-8 // B))  # keep U*B >= 8 sublanes
    nblkp = _round_up(nblk, u_units)

    o_loc = (r >> 7) % B
    lam = r & 127
    src_rel = f - base[ob]
    uu = (src_rel >> 7).astype(np.int32)
    ls = (src_rel & 127).astype(np.int32)

    # both tables padded to (128, 128) per block (same-shape gathers)
    Ls_t = np.zeros((nblkp, 128, 128), np.int32)
    Ut_t = np.zeros((nblkp, 128, 128), np.int32)
    Ls_t[ob, uu, lam] = ls
    Ut_t[ob, lam, o_loc] = uu

    rows0 = np.zeros((nblkp,), np.int32)
    rows0[:nblk] = (base >> 7).astype(np.int32)

    rows_kept = f // n
    lens = np.bincount(rows_kept, minlength=m)
    indptr = np.zeros((m + 1,), np.int32)
    np.cumsum(lens, out=indptr[1:])
    indices = (f % n).astype(np.int32)

    return CompressPlan(
        m=m, n=n, cap=cap, B=B, S_D=128, U=u_units, NBLK=nblkp,
        RT_PAD=rt_pad,
        rows0=jnp.asarray(rows0),
        pkA=jnp.asarray(Ls_t.reshape(nblkp * 128, 128)),
        pkB=jnp.asarray(Ut_t.reshape(nblkp * 128, 128)),
        indptr=jnp.asarray(indptr),
        indices=jnp.asarray(indices))


def _expand_kernel(rows0_ref, vals_ref, pkA_ref, pkB_ref, dv_ref,
                   dp_ref=None, *, B: int, S_SRC: int, U: int):
    del S_SRC  # source slices are always 128 rows (same-shape gathers)
    i = pl.program_id(0)
    for j in range(U):
        row0 = rows0_ref[i * U + j]
        zz = vals_ref[pl.ds(pl.multiple_of(row0, 8), 128), :]
        zzT = zz.T                                     # (128, 128)
        ut = pkA_ref[j * 128:(j + 1) * 128, :]         # (128, 128)
        y = jnp.take_along_axis(zzT, ut, axis=1)       # (128, 128)
        yT = y[:, :B].T                                # (B, 128)
        pb = pkB_ref[j * B:(j + 1) * B, :]             # (B, 128)
        lidx = pb & 127
        flag = pb >> 7
        o = jnp.take_along_axis(yT, lidx, axis=1)      # (B, 128)
        dv_ref[j * B:(j + 1) * B, :] = jnp.where(flag == 1, 0.0, o)
        if dp_ref is not None:
            dp_ref[j * B:(j + 1) * B, :] = (flag == 0).astype(jnp.bfloat16)


@functools.partial(
    memtrace.jit, static_argnames=("m", "k", "B", "S_SRC", "U", "NBLK", "NV",
                              "emit_pattern", "interpret"))
def _expand_call(vals, rows0, pkA, pkB, m, k, B, S_SRC, U, NBLK, NV,
                 emit_pattern=True, interpret=False):
    nnz = vals.shape[0]
    vp = jnp.zeros((NV * 128,), vals.dtype).at[:nnz].set(
        vals.astype(jnp.float32)).reshape(NV, 128)
    nsteps = NBLK // U
    out_spec = pl.BlockSpec((U * B, 128), lambda i, r: (i, 0))
    out_shape = jax.ShapeDtypeStruct((NBLK * B, 128), jnp.float32)
    if emit_pattern:
        out_specs = [out_spec, pl.BlockSpec((U * B, 128),
                                            lambda i, r: (i, 0))]
        out_shapes = [out_shape,
                      jax.ShapeDtypeStruct((NBLK * B, 128), jnp.bfloat16)]
    else:
        out_specs = out_spec
        out_shapes = out_shape
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((NV, 128), lambda i, r: (0, 0)),
            pl.BlockSpec((U * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((U * B, 128), lambda i, r: (i, 0)),
        ],
        out_specs=out_specs,
    )
    res = pl.pallas_call(
        functools.partial(_expand_kernel, B=B, S_SRC=S_SRC, U=U),
        grid_spec=gs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(rows0, vp, pkA, pkB)
    rtot = m * k // 128
    if emit_pattern:
        dv, dp = res
        return dv[:rtot].reshape(m, k), dp[:rtot].reshape(m, k)
    return res[:rtot].reshape(m, k)


def densify_routed(vals, plan: ExpandPlan, emit_pattern: bool = True,
                   interpret: bool = False):
    """Dense (m, k) f32 from CSR values via the static routing plan, plus
    (when `emit_pattern`) the structural bf16 pattern.  Values are moved
    bitwise; empty cells are +0.0."""
    return _expand_call(vals, plan.rows0, plan.pkA, plan.pkB,
                        plan.m, plan.k, plan.B, plan.S_SRC, plan.U,
                        plan.NBLK, plan.NV, emit_pattern, interpret)


def _compress_kernel(rows0_ref, c_ref, pkA_ref, pkB_ref, out_ref,
                     *, B: int, S_D: int, U: int):
    del S_D  # source slices are always 128 rows (same-shape gathers)
    i = pl.program_id(0)
    parts = []
    for j in range(U):
        row0 = rows0_ref[i * U + j]
        zz = c_ref[pl.ds(pl.multiple_of(row0, 8), 128), :]
        ls = pkA_ref[j * 128:(j + 1) * 128, :]         # (128, 128)
        w = jnp.take_along_axis(zz, ls, axis=1)        # (128, 128)
        wT = w.T                                       # (128, 128)
        ut = pkB_ref[j * 128:(j + 1) * 128, :]         # (128, 128)
        oT = jnp.take_along_axis(wT, ut, axis=1)       # (128, 128)
        parts.append(oT[:, :B].T)                      # (B, 128)
    # one aligned (U*B, 128) store (U*B >= 8 by plan construction), so
    # B < 8 never issues a sub-sublane store
    out_ref[...] = parts[0] if U == 1 else jnp.concatenate(parts, axis=0)


@functools.partial(
    memtrace.jit, static_argnames=("B", "S_D", "U", "NBLK", "RT_PAD", "cap",
                              "interpret"))
def _compress_call(c, rows0, pkA, pkB, B, S_D, U, NBLK, RT_PAD, cap,
                   interpret=False):
    mk = c.shape[0] * c.shape[1]
    cf = c.reshape(mk // 128, 128)
    if RT_PAD > mk // 128:
        cf = jnp.concatenate(
            [cf, jnp.zeros((RT_PAD - mk // 128, 128), c.dtype)])
    nsteps = NBLK // U
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((RT_PAD, 128), lambda i, r: (0, 0)),
            pl.BlockSpec((U * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((U * 128, 128), lambda i, r: (i, 0)),
        ],
        out_specs=pl.BlockSpec((U * B, 128), lambda i, r: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_compress_kernel, B=B, S_D=S_D, U=U),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NBLK * B, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(rows0, cf, pkA, pkB)
    return out.reshape(NBLK * B * 128)[:cap]


def extract_routed(c, plan: CompressPlan, interpret: bool = False):
    """Values of the fixed output structure, extracted from dense c in
    row-major order (bitwise the dense values)."""
    return _compress_call(c, plan.rows0, plan.pkA, plan.pkB,
                          plan.B, plan.S_D, plan.U, plan.NBLK,
                          plan.RT_PAD, plan.cap, interpret)
