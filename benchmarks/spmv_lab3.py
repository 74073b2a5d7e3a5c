#!/usr/bin/env python
"""SpMV lab 3: find the per-step cost cliff and the binned-gather floor.

Questions (in-scan, overhead-subtracted, v5e via relay):
  A. gather_fat per-step cost at FIXED shapes vs nsteps — lab1 saw
     4.4 us/step at nsteps=7 but 29.5 us/step at nsteps=62 for identical
     per-step work.  Sweep nnz (so nsteps) and (CH, U).
  B. does the (m_pad, 1) output block (pads 128x in VMEM) cost per step?
     gather-only with (8, 128) out vs (m_pad, 1) out.
  C. binned lane-gather floor: xq (128,128) resident, stream (U*128,128)
     idx + val blocks, same-shape take_along_axis + multiply + ones-dot
     checksum.  This is the gather+mult half of a binned SpMV.
  D. reduce with the bf16-triple batched as a 3-column dot (1 MXU pass)
     vs 3 separate (CH,1) dots.
"""

import functools
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402

INDEX = jnp.int32
K_INNER = 200
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


def bench_scan(name, make_body, carry0, nslots=None, nsteps=None):
    global _OVERHEAD
    if _OVERHEAD is None:
        _OVERHEAD = _calibrate()
        print(f"  [call overhead {_OVERHEAD:.1f} ms]", flush=True)

    @jax.jit
    def loop(c0):
        def body(c, _):
            return make_body(c), ()
        cf, _ = lax.scan(body, c0, None, length=K_INNER)
        return cf

    jax.block_until_ready(loop(carry0))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        ts.append(((time.perf_counter() - t0) * 1e3 - _OVERHEAD) / K_INNER)
    med = statistics.median(ts)
    extra = ""
    if nslots:
        extra = (f" {med * 1e6 / nslots:7.3f} ns/slot"
                 f" = {nslots / med / 1e6:8.3f} G/s")
    if nsteps:
        extra += f"  {med * 1e3 / nsteps:7.2f} us/step"
    print(f"  {name:<46s} {med:9.4f} ms{extra}", flush=True)
    return med


# --- A/B: gather_fat-shaped kernel, parametrized out layout -----------------

def _gf_kernel(rows_ref, colq_ref, coll_ref, vals_ref, x3_ref, y_ref,
               *, KQ, KQP, CH, U, out_small):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for j in range(U):
        lane_oh = (coll_ref[:, j:j + 1]
                   == lax.broadcasted_iota(INDEX, (CH, 128), 1)
                   ).astype(jnp.bfloat16)
        pf = jnp.dot(lane_oh, x3_ref[...],
                     preferred_element_type=jnp.float32)
        p = (pf[:, :KQ] + pf[:, KQP:KQP + KQ]
             + pf[:, 2 * KQP:2 * KQP + KQ])
        qmask = (colq_ref[:, j:j + 1]
                 == lax.broadcasted_iota(INDEX, (CH, KQ), 1))
        xval = jnp.sum(jnp.where(qmask, p, 0.0), axis=1, keepdims=True)
        z = vals_ref[:, j:j + 1] * xval
        ones = jnp.ones((8, CH), jnp.bfloat16)
        acc = lax.dot_general(ones, z.astype(jnp.bfloat16),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
        if out_small:
            y_ref[:, :1] += acc[:, :1] if acc.shape[1] == 1 else acc
        else:
            y_ref[pl.ds(0, 8), :] += acc


@functools.partial(jax.jit,
                   static_argnames=("m_pad", "KQ", "KQP", "CH", "U",
                                    "nsteps", "out_small"))
def gf_call(rows, colq, coll, vals, x3, m_pad, KQ, KQP, CH, U, nsteps,
            out_small):
    out_shape = (jax.ShapeDtypeStruct((8, 128), jnp.float32) if out_small
                 else jax.ShapeDtypeStruct((m_pad, 1), jnp.float32))
    out_spec = (pl.BlockSpec((8, 128), lambda i: (0, 0)) if out_small
                else pl.BlockSpec((m_pad, 1), lambda i: (0, 0)))
    return pl.pallas_call(
        functools.partial(_gf_kernel, KQ=KQ, KQP=KQP, CH=CH, U=U,
                          out_small=out_small),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
            pl.BlockSpec((128, 3 * KQP), lambda i: (0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(rows, colq, coll, vals, x3)


def run_A_B():
    n = 10_000
    m_pad = n + 128
    n_pad = 10112
    KQ = n_pad // 128
    KQP = 128
    key = jax.random.PRNGKey(0)
    x3 = jax.random.uniform(key, (128, 3 * KQP), jnp.float32
                            ).astype(jnp.bfloat16)

    print("-- A: per-step cost vs nsteps (fixed CH=1024 U=16)", flush=True)
    for nsteps in (7, 15, 31, 62):
        CH, U = 1024, 16
        tot = nsteps * CH * U
        rows = jax.random.randint(key, (nsteps * CH, U), 0, n, INDEX)
        colq = jax.random.randint(key, (nsteps * CH, U), 0, KQ, INDEX)
        coll = jax.random.randint(key, (nsteps * CH, U), 0, 128, INDEX)
        vals = jax.random.uniform(key, (nsteps * CH, U), jnp.float32)

        def body(c, rows=rows, colq=colq, coll=coll, nsteps=nsteps):
            y = gf_call(rows, colq, coll, c, x3, m_pad, KQ, KQP, 1024, 16,
                        nsteps, False)
            return c + 1e-30 * jnp.max(y)
        bench_scan(f"gf nsteps={nsteps} slots={tot}", body, vals,
                   nslots=tot, nsteps=nsteps)

    print("-- B: out block (m_pad,1) vs (8,128), nsteps=62", flush=True)
    nsteps, CH, U = 62, 1024, 16
    tot = nsteps * CH * U
    rows = jax.random.randint(key, (nsteps * CH, U), 0, n, INDEX)
    colq = jax.random.randint(key, (nsteps * CH, U), 0, KQ, INDEX)
    coll = jax.random.randint(key, (nsteps * CH, U), 0, 128, INDEX)
    vals = jax.random.uniform(key, (nsteps * CH, U), jnp.float32)
    for out_small in (False, True):
        def body(c, out_small=out_small):
            y = gf_call(rows, colq, coll, c, x3, m_pad, KQ, KQP, CH, U,
                        nsteps, out_small)
            return c + 1e-30 * jnp.max(y)
        bench_scan(f"gf out_small={out_small}", body, vals,
                   nslots=tot, nsteps=nsteps)

    print("-- A2: (CH,U) sweep at ~1M slots", flush=True)
    for CH, U in ((1024, 32), (2048, 16), (2048, 32), (4096, 16),
                  (512, 16)):
        nsteps = max(1, (1 << 20) // (CH * U))
        tot = nsteps * CH * U
        rows = jax.random.randint(key, (nsteps * CH, U), 0, n, INDEX)
        colq = jax.random.randint(key, (nsteps * CH, U), 0, KQ, INDEX)
        coll = jax.random.randint(key, (nsteps * CH, U), 0, 128, INDEX)
        vals = jax.random.uniform(key, (nsteps * CH, U), jnp.float32)

        def body(c, rows=rows, colq=colq, coll=coll, CH=CH, U=U,
                 nsteps=nsteps):
            y = gf_call(rows, colq, coll, c, x3, m_pad, KQ, KQP, CH, U,
                        nsteps, False)
            return c + 1e-30 * jnp.max(y)
        bench_scan(f"gf CH={CH} U={U} nsteps={nsteps}", body, vals,
                   nslots=tot, nsteps=nsteps)


# --- C: binned same-shape lane-gather floor ---------------------------------

def _bin_kernel(idx_ref, val_ref, xq_ref, y_ref, *, U):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    acc = jnp.zeros((8, 128), jnp.float32)
    for j in range(U):
        sl = slice(j * 128, (j + 1) * 128)
        xv = jnp.take_along_axis(xq_ref[...], idx_ref[sl, :], axis=1)
        prod = val_ref[sl, :] * xv                        # (128, 128)
        ones = jnp.ones((8, 128), jnp.bfloat16)
        acc += lax.dot_general(ones, prod.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    y_ref[...] += acc


@functools.partial(jax.jit, static_argnames=("U", "nsteps"))
def bin_call(idx, vals, xq, U, nsteps):
    return pl.pallas_call(
        functools.partial(_bin_kernel, U=U),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((U * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((U * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(idx, vals, xq)


def run_C():
    print("-- C: binned same-shape gather+mult floor (xq resident)",
          flush=True)
    key = jax.random.PRNGKey(1)
    xq = jax.random.uniform(key, (128, 128), jnp.float32)
    for U, nsteps in ((8, 8), (8, 64), (16, 32), (32, 16)):
        tot = nsteps * U * 128 * 128
        idx = jax.random.randint(key, (nsteps * U * 128, 128), 0, 79,
                                 INDEX)
        vals = jax.random.uniform(key, (nsteps * U * 128, 128),
                                  jnp.float32)

        def body(c, idx=idx, U=U, nsteps=nsteps):
            y = bin_call(idx, c, xq, U, nsteps)
            return c + 1e-30 * jnp.max(y)
        bench_scan(f"binned U={U} nsteps={nsteps} slots={tot}", body,
                   vals, nslots=tot, nsteps=nsteps)


# --- D: reduce triple as one 3-column dot -----------------------------------

def _red_kernel(rows_ref, z_ref, y_ref, *, W, CH, U, fat):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for j in range(U):
        z = z_ref[:, j:j + 1]
        bits = lax.bitcast_convert_type(z, jnp.int32)
        zhi = lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                       jnp.float32)
        r1 = z - zhi
        bits1 = lax.bitcast_convert_type(r1, jnp.int32)
        zmid = lax.bitcast_convert_type(bits1 & jnp.int32(-65536),
                                        jnp.float32)
        zlo = r1 - zmid
        eq_t = (rows_ref[:, j:j + 1]
                == lax.broadcasted_iota(INDEX, (CH, W), 1)
                ).astype(jnp.bfloat16)
        if fat:
            z3 = jnp.concatenate(
                [zhi.astype(jnp.bfloat16), zmid.astype(jnp.bfloat16),
                 zlo.astype(jnp.bfloat16)], axis=1)      # (CH, 3)
            yw3 = lax.dot_general(eq_t, z3, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            y_win = ((yw3[:, :1] + yw3[:, 1:2]) + yw3[:, 2:3])
        else:
            def ydot(zz, eq_t=eq_t):
                return lax.dot_general(
                    eq_t, zz.astype(jnp.bfloat16),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            y_win = (ydot(zhi) + ydot(zmid)) + ydot(zlo)
        y_ref[pl.ds(0, W), :] += y_win


@functools.partial(jax.jit, static_argnames=("W", "CH", "U", "nsteps",
                                             "fat"))
def red_call(rows, z, W, CH, U, nsteps, fat):
    return pl.pallas_call(
        functools.partial(_red_kernel, W=W, CH=CH, U=U, fat=fat),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
            pl.BlockSpec((CH, U), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((W + 8, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((W + 8, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(rows, z)


def run_D():
    print("-- D: reduce 3x(CH,1) dots vs one (CH,3) dot", flush=True)
    key = jax.random.PRNGKey(2)
    CH, U, nsteps = 1024, 16, 62
    tot = nsteps * CH * U
    for W in (32, 128):
        rows = jax.random.randint(key, (nsteps * CH, U), 0, W, INDEX)
        z = jax.random.uniform(key, (nsteps * CH, U), jnp.float32)
        for fat in (False, True):
            def body(c, W=W, fat=fat, rows=rows):
                y = red_call(rows, c, W, CH, U, nsteps, fat)
                return c + 1e-30 * jnp.max(y)
            bench_scan(f"reduce W={W} fat={fat}", body, z,
                       nslots=tot, nsteps=nsteps)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    run_A_B()
    run_C()
    run_D()


if __name__ == "__main__":
    main()
