#!/usr/bin/env python
"""SpMV lab 6: boundary-split y updates for the routed fused kernel.

The landed fused kernel (spmv_routed, U1F=2) spends ~128 of its ~336
VPU ops/tile on 16 per-sub-block masked dynamic y updates.  Sub-blocks
are group-pure and groups occupy CONTIGUOUS lane-row ranges, so a
128-lane-row tile straddles at most ceil(128/min L_g)+1 groups — with
the typical L_g >= 64 that is <= 3 segments.  Variants:

  A. baseline U1F=2 (the landed kernel)
  E. seg-NSEG: one (16,128) sub-block-sum array per tile (reshape+sum),
     then NSEG masked-range updates driven by a per-tile packed
     (group, lo, hi) scalar-prefetch table
  F. E with pl.when guards skipping empty trailing segments

Each variant is correctness-checked vs scipy before timing.
"""

import functools
import os
import statistics
import sys
import time

INTERPRET = bool(int(os.environ.get("SPMV_LAB6_INTERPRET", "0")))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops.kernels.spmv_routed import (  # noqa: E402
    SB, spmv_routed_plan, _round_up, _ceil_div)

K_INNER = 400
REPS = 5
_OVERHEAD = None


def _calibrate():
    @jax.jit
    def trivial(x):
        def body(c, _):
            return c * 1.0000001, ()
        cf, _ = lax.scan(body, x, None, length=K_INNER)
        return cf

    jax.block_until_ready(trivial(jnp.float32(1.0)))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(jnp.float32(1.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


def build_seg_tbl(r0s_np, nsegs: int):
    """Per-tile packed (group<<10 | lo<<5 | hi) segment table from the
    per-sub-block group-base array; lo/hi in sub-block units [0,16].
    Returns (flat table, max segments seen) or (None, maxseg) if any
    tile needs more than `nsegs` segments."""
    g = np.asarray(r0s_np, np.int64) >> 7
    ntiles = g.shape[0] // 16
    seg = np.zeros((ntiles, nsegs), np.int32)
    maxseg = 0
    for t in range(ntiles):
        gt = g[t * 16:(t + 1) * 16]
        bnd = [0] + [u for u in range(1, 16) if gt[u] != gt[u - 1]] + [16]
        runs = [(int(gt[bnd[k]]), bnd[k], bnd[k + 1])
                for k in range(len(bnd) - 1)]
        maxseg = max(maxseg, len(runs))
        if len(runs) > nsegs:
            return None, maxseg
        for s in range(nsegs):
            gg, lo, hi = runs[s] if s < len(runs) else (runs[-1][0], 0, 0)
            seg[t, s] = (gg << 10) | (lo << 5) | hi
    return seg.reshape(-1), maxseg


def _fused_kernel_seg(seg_ref, hi_ref, val_ref, route_ref, xq_ref, y_ref,
                      *, C: int, U1F: int, NSEG: int, guard: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    iota8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    iota16 = lax.broadcasted_iota(jnp.int32, (16, 128), 0)
    for j in range(U1F):
        sl = slice(j * 128, (j + 1) * 128)
        hi_t = hi_ref[sl, :]
        idx = hi_t & 127
        xv = jnp.take_along_axis(xq[0:128, :], idx, axis=1)
        for t in range(1, C):
            xt = jnp.take_along_axis(xq[t * 128:(t + 1) * 128, :], idx,
                                     axis=1)
            xv = jnp.where((hi_t >> 7) == t, xt, xv)
        prod = (val_ref[sl, :] * xv).T
        r = route_ref[sl, :].astype(jnp.int32)
        routed = jnp.where(
            r >= 0, jnp.take_along_axis(prod, jnp.maximum(r, 0), axis=1),
            0.0)
        s16 = jnp.sum(routed.reshape(16, SB, 128), axis=1)
        tile = i * U1F + j
        for s in range(NSEG):
            w = seg_ref[tile * NSEG + s]
            g = w >> 10
            lo = (w >> 5) & 31
            hi = w & 31

            def upd(g=g, lo=lo, hi=hi):
                msk = (iota16 >= lo) & (iota16 < hi)
                y_win = jnp.sum(jnp.where(msk, s16, 0.0), axis=0,
                                keepdims=True)
                sb_ = pl.multiple_of(g & (-8), 8)
                y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
                y_ref[pl.ds(sb_, 8), :] += y8

            if guard and s > 0:
                pl.when(hi > lo)(upd)
            else:
                upd()


def _fused_kernel_base(r0s_ref, hi_ref, val_ref, route_ref, xq_ref, y_ref,
                       *, C: int, U1F: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    xq = xq_ref[...]
    iota8 = lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    for j in range(U1F):
        sl = slice(j * 128, (j + 1) * 128)
        hi = hi_ref[sl, :]
        idx = hi & 127
        xv = jnp.take_along_axis(xq[0:128, :], idx, axis=1)
        for t in range(1, C):
            xt = jnp.take_along_axis(xq[t * 128:(t + 1) * 128, :], idx,
                                     axis=1)
            xv = jnp.where((hi >> 7) == t, xt, xv)
        prod = (val_ref[sl, :] * xv).T
        r = route_ref[sl, :].astype(jnp.int32)
        routed = jnp.where(
            r >= 0, jnp.take_along_axis(prod, jnp.maximum(r, 0), axis=1),
            0.0)
        for u in range(128 // SB):
            y_win = jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                            keepdims=True)
            g = r0s_ref[(i * U1F + j) * (128 // SB) + u] >> 7
            s = pl.multiple_of(g & (-8), 8)
            y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
            y_ref[pl.ds(s, 8), :] += y8


@functools.partial(
    jax.jit, static_argnames=("plan_static", "U1F", "NSEG", "guard"))
def spmv_v(hi_tbl, val_tbl, route_tbl, sc, x, plan_static,
           U1F=2, NSEG=0, guard=False):
    """NSEG=0 -> baseline kernel (sc is r0s); NSEG>0 -> segment kernel
    (sc is the packed per-tile segment table)."""
    m, n, NL, R, C = plan_static
    m128 = 128 // R
    n_pad = C * 128 * m128
    xp = x.astype(jnp.float32)
    if n < n_pad:
        xp = jnp.concatenate([xp, jnp.zeros((n_pad - n,), jnp.float32)])
    xq = jnp.tile(xp.reshape(C, 128, m128).transpose(0, 2, 1),
                  (1, R, 1)).reshape(C * 128, 128)

    G_pad = _round_up(_ceil_div(m, 128), 8)
    nstepsf = max(_ceil_div(NL, U1F * 128), 1)
    if NSEG == 0:
        kern = functools.partial(_fused_kernel_base, C=C, U1F=U1F)
    else:
        kern = functools.partial(_fused_kernel_seg, C=C, U1F=U1F,
                                 NSEG=NSEG, guard=guard)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nstepsf,),
        in_specs=[
            pl.BlockSpec((U1F * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((U1F * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((U1F * 128, 128), lambda i, r: (i, 0)),
            pl.BlockSpec((C * 128, 128), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((G_pad, 128), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        kern,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=INTERPRET,
    )(sc, hi_tbl, val_tbl, route_tbl, xq)
    return y.reshape(G_pad * 128)[:m]


def bench_variant(name, plan, sc, x, y_ref_np, nnz, U1F, NSEG, guard):
    global _OVERHEAD
    if _OVERHEAD is None:
        _OVERHEAD = _calibrate()
        print(f"  [call overhead {_OVERHEAD:.1f} ms]", flush=True)
    ps = (plan.m, plan.n, plan.NL, plan.R, plan.C)
    args = (plan.hi_tbl, plan.val_tbl, plan.route_tbl, sc)

    y = np.asarray(spmv_v(*args, x, ps, U1F, NSEG, guard))
    err = float(np.max(np.abs(y - y_ref_np))
                / max(1e-30, float(np.max(np.abs(y_ref_np)))))
    ok = err < 1e-5

    m = plan.m

    @jax.jit
    def loop(x0):
        def body(c, _):
            y = spmv_v(*args, c, ps, U1F, NSEG, guard)
            c2 = c + 0.0 * jnp.sum(y) if plan.n < m else \
                c.at[:m].add(0.0 * y)
            return c2, ()
        cf, _ = lax.scan(body, x0, None, length=K_INNER)
        return cf

    jax.block_until_ready(loop(x))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(x))
        ts.append(((time.perf_counter() - t0) * 1e3 - _OVERHEAD) / K_INNER)
    ms = min(ts)
    print(f"  {name:28s} err={err:.2e} {'OK ' if ok else 'BAD'} "
          f"{ms * 1e3:8.1f} us  {nnz / ms / 1e6:7.2f} Gnnz/s", flush=True)
    return ms


def run_config(m, n, density, seed):
    a = st.random(m, n, density, format="csr", random_state=seed)
    nnz = int(a.nnz)
    print(f"config {m}x{n} rho={density} nnz={nnz}", flush=True)
    t0 = time.time()
    plan = spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                            np.asarray(a.data), m, n)
    print(f"  plan: {time.time() - t0:.1f}s  NL={plan.NL} R={plan.R} "
          f"C={plan.C} slots/nnz={plan.NL * 128 / nnz:.2f}", flush=True)
    rng = np.random.default_rng(7)
    x_np = rng.random(n, dtype=np.float32)
    import scipy.sparse as sp
    A = sp.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                       np.asarray(a.indptr)), shape=(m, n))
    y_np = A @ x_np
    x = jnp.asarray(x_np)

    r0s_np = np.asarray(plan.r0s)
    seg3, maxseg = build_seg_tbl(r0s_np, 3)
    print(f"  max segments/tile = {maxseg}", flush=True)
    variants = [("A baseline U1F=2", plan.r0s, 2, 0, False)]
    if seg3 is not None:
        seg3j = jnp.asarray(seg3)
        variants += [("E seg3 U1F=2", seg3j, 2, 3, False),
                     ("F seg3+guard U1F=2", seg3j, 2, 3, True)]
        if maxseg <= 2:
            seg2, _ = build_seg_tbl(r0s_np, 2)
            variants.append(("G seg2 U1F=2", jnp.asarray(seg2), 2, 2,
                             False))
    for name, sc, u, nseg, gd in variants:
        try:
            bench_variant(name, plan, sc, x, y_np, nnz, u, nseg, gd)
        except Exception as e:
            print(f"  {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    run_config(10000, 10000, 1e-3, 42)
    run_config(10000, 10000, 1e-2, 43)
    run_config(16384, 16384, 5e-3, 44)
