#!/usr/bin/env python
"""SpMV lab 5: cut the routed kernel's VPU/step costs.

The fused routed kernel is VPU/step bound, not HBM bound (fusing away
the z intermediate — 8 of ~17 HBM bytes/slot — changed nothing, commit
5a53517).  Variants measured here:

  A. baseline fused kernel (spmv_routed as landed)
  B. U1F=2 (two tiles per grid step — halves per-step overhead; 32
     dynamic stores per step is the known Mosaic compile-time boundary)
  C. group-pure-tile fast path: most 128-lane-row tiles belong to ONE
     row group (L_g >= 128 whenever a group has >= ~16k entries), so a
     predicated branch sums all 128 sublanes into a single masked
     dynamic update instead of 16 — the update loop is >half the
     per-tile VPU ops
  D. B + C

Run on the TPU worker; each variant is correctness-checked vs numpy
before timing.
"""

import functools
import os
import statistics
import sys
import time

INTERPRET = bool(int(os.environ.get("SPMV_LAB5_INTERPRET", "0")))

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


def _fused_kernel_v(r0s_ref, hi_ref, val_ref, route_ref, xq_ref, y_ref,
                    *, C: int, U1F: int, pure_fast: bool):
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
        base = (i * U1F + j) * (128 // SB)
        if pure_fast:
            g0 = r0s_ref[base] >> 7
            gl = r0s_ref[base + (128 // SB) - 1] >> 7

            @pl.when(g0 == gl)
            def _():
                y_win = jnp.sum(routed, axis=0, keepdims=True)
                s = pl.multiple_of(g0 & (-8), 8)
                y8 = jnp.where(iota8 == (g0 & 7), y_win, 0.0)
                y_ref[pl.ds(s, 8), :] += y8

            @pl.when(g0 != gl)
            def _():
                for u in range(128 // SB):
                    y_win = jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                                    keepdims=True)
                    g = r0s_ref[base + u] >> 7
                    s = pl.multiple_of(g & (-8), 8)
                    y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
                    y_ref[pl.ds(s, 8), :] += y8
        else:
            for u in range(128 // SB):
                y_win = jnp.sum(routed[u * SB:(u + 1) * SB, :], axis=0,
                                keepdims=True)
                g = r0s_ref[base + u] >> 7
                s = pl.multiple_of(g & (-8), 8)
                y8 = jnp.where(iota8 == (g & 7), y_win, 0.0)
                y_ref[pl.ds(s, 8), :] += y8


@functools.partial(jax.jit,
                   static_argnames=("plan_static", "U1F", "pure_fast"))
def spmv_v(hi_tbl, val_tbl, route_tbl, r0s, x, plan_static,
           U1F=1, pure_fast=False):
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
    NLF = nstepsf * U1F * 128
    if NLF > NL:  # pad tables for the U1F grid (dead slots are zeros)
        hi_tbl = jnp.concatenate(
            [hi_tbl, jnp.zeros((NLF - NL, 128), hi_tbl.dtype)])
        val_tbl = jnp.concatenate(
            [val_tbl, jnp.zeros((NLF - NL, 128), val_tbl.dtype)])
        route_tbl = jnp.concatenate(
            [route_tbl, jnp.full((NLF - NL, 128), -1, route_tbl.dtype)])
        r0s = jnp.concatenate(
            [r0s, jnp.zeros((NLF // SB - r0s.shape[0],), r0s.dtype)])
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
        functools.partial(_fused_kernel_v, C=C, U1F=U1F,
                          pure_fast=pure_fast),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((G_pad, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=INTERPRET,
    )(r0s, hi_tbl, val_tbl, route_tbl, xq)
    return y.reshape(G_pad * 128)[:m]


def bench_variant(name, plan, x, y_ref_np, nnz, U1F, pure_fast):
    global _OVERHEAD
    if _OVERHEAD is None:
        _OVERHEAD = _calibrate()
        print(f"  [call overhead {_OVERHEAD:.1f} ms]", flush=True)
    ps = (plan.m, plan.n, plan.NL, plan.R, plan.C)
    args = (plan.hi_tbl, plan.val_tbl, plan.route_tbl, plan.r0s)

    y = np.asarray(spmv_v(*args, x, ps, U1F, pure_fast))
    err = float(np.max(np.abs(y - y_ref_np))
                / max(1e-30, float(np.max(np.abs(y_ref_np)))))
    ok = err < 1e-5

    m = plan.m

    @jax.jit
    def loop(x0):
        def body(c, _):
            y = spmv_v(*args, c, ps, U1F, pure_fast)
            # feedback so iterations can't fuse/CSE away
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
    for name, u, pf in (("A baseline U1F=1", 1, False),
                        ("B U1F=2", 2, False),
                        ("C pure-fast U1F=1", 1, True),
                        ("D pure-fast U1F=2", 2, True)):
        try:
            bench_variant(name, plan, x, y_np, nnz, u, pf)
        except Exception as e:
            print(f"  {name:28s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    run_config(10000, 10000, 1e-3, 42)
    run_config(10000, 10000, 1e-2, 43)
    run_config(16384, 16384, 5e-3, 44)
