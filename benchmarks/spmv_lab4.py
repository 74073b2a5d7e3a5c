#!/usr/bin/env python
"""SpMV lab 4: validate the two halves of the binned SpMV design.

  K1. binned gather+mult kernel: xq (128,128) resident; per (128,128)
      tile take_along_axis by a streamed hi-table, multiply by streamed
      vals, TRANSPOSE, write prod tiles to HBM (pos-major).  Correctness
      vs numpy + in-scan rate.
  K2. wide one-hot reduce: (CH, U) prod blocks + i8 relative-row blocks,
      bf16 triple-split done WIDE (once per step), eq + 3 skinny dots per
      sub-chunk, W=128 aligned windows.  Rate vs the old per-sub-chunk
      split (the 0.65 ns/e baseline), plus correctness.
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


def bench_scan(name, make_body, carry0, nslots=None):
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
    print(f"  {name:<46s} {med:9.4f} ms{extra}", flush=True)
    return med


# --- K1: binned gather + mult + transpose -> prod ---------------------------

def _k1_kernel(hi_ref, val_ref, xq_ref, out_ref, *, U):
    for j in range(U):
        sl = slice(j * 128, (j + 1) * 128)
        idx = hi_ref[sl, :].astype(jnp.int32)
        xv = jnp.take_along_axis(xq_ref[...], idx, axis=1)
        prod = val_ref[sl, :] * xv
        out_ref[sl, :] = prod.T


@functools.partial(jax.jit, static_argnames=("U", "nsteps"))
def k1_call(hi, vals, xq, U, nsteps):
    return pl.pallas_call(
        functools.partial(_k1_kernel, U=U),
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((U * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((U * 128, 128), lambda i: (i, 0)),
            pl.BlockSpec((128, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((U * 128, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nsteps * U * 128, 128),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(hi, vals, xq)


def run_k1():
    print("-- K1: binned gather+mult+T -> prod (verified)", flush=True)
    key = jax.random.PRNGKey(1)
    xq = jax.random.uniform(key, (128, 128), jnp.float32)
    for U, nsteps, idt in ((8, 16, jnp.int32), (8, 64, jnp.int32),
                           (8, 64, jnp.int8), (16, 32, jnp.int32)):
        rows = nsteps * U * 128
        tot = rows * 128
        hi = jax.random.randint(key, (rows, 128), 0, 100, INDEX
                                ).astype(idt)
        vals = jax.random.uniform(jax.random.PRNGKey(2), (rows, 128),
                                  jnp.float32)
        out = k1_call(hi, vals, xq, U, nsteps)
        # verify one tile
        h0 = np.asarray(hi[:128], np.int64)
        v0 = np.asarray(vals[:128])
        x0 = np.asarray(xq)
        want = (v0 * np.take_along_axis(x0, h0, axis=1)).T
        got = np.asarray(out[:128])
        err = np.abs(want - got).max()
        ok = "OK" if err == 0.0 else f"MISMATCH {err:.2e}"

        def body(c, hi=hi, U=U, nsteps=nsteps):
            o = k1_call(hi, c, xq, U, nsteps)
            return c + 1e-30 * jnp.max(o)
        t = bench_scan(
            f"k1 U={U} ns={nsteps} idx={np.dtype(idt.dtype).name} [{ok}]",
            body, vals, nslots=tot)


# --- K2: wide reduce --------------------------------------------------------

def _k2_kernel(r0s_ref, rows_ref, z_ref, y_ref, *, W, CH, U, wide):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    if wide:
        z = z_ref[...]                                  # (CH, U) f32
        bits = lax.bitcast_convert_type(z, jnp.int32)
        zhi = lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                       jnp.float32)
        r1 = z - zhi
        bits1 = lax.bitcast_convert_type(r1, jnp.int32)
        zmid = lax.bitcast_convert_type(bits1 & jnp.int32(-65536),
                                        jnp.float32)
        zlo = (r1 - zmid).astype(jnp.bfloat16)
        zhi = zhi.astype(jnp.bfloat16)
        zmid = zmid.astype(jnp.bfloat16)
        rw = rows_ref[...].astype(jnp.int32)            # (CH, U)
    for j in range(U):
        if wide:
            h, md, lo = zhi[:, j:j + 1], zmid[:, j:j + 1], zlo[:, j:j + 1]
            rr = rw[:, j:j + 1]
        else:
            z = z_ref[:, j:j + 1]
            bits = lax.bitcast_convert_type(z, jnp.int32)
            h32 = lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                           jnp.float32)
            r1 = z - h32
            bits1 = lax.bitcast_convert_type(r1, jnp.int32)
            m32 = lax.bitcast_convert_type(bits1 & jnp.int32(-65536),
                                           jnp.float32)
            lo = (r1 - m32).astype(jnp.bfloat16)
            h, md = h32.astype(jnp.bfloat16), m32.astype(jnp.bfloat16)
            rr = rows_ref[:, j:j + 1].astype(jnp.int32)
        eq_t = (rr == lax.broadcasted_iota(jnp.int32, (CH, W), 1)
                ).astype(jnp.bfloat16)

        def ydot(zz, eq_t=eq_t):
            return lax.dot_general(
                eq_t, zz, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        y_win = (ydot(h) + ydot(md)) + ydot(lo)
        r0 = r0s_ref[i * U + j]
        s = pl.multiple_of(r0, 8)
        y_ref[pl.ds(s, W), :] += y_win


@functools.partial(jax.jit, static_argnames=("W", "CH", "U", "nsteps",
                                             "m_pad", "wide"))
def k2_call(r0s, rows, z, W, CH, U, nsteps, m_pad, wide):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda i, r: (0, 0)),
    )
    return pl.pallas_call(
        functools.partial(_k2_kernel, W=W, CH=CH, U=U, wide=wide),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(r0s, rows, z)


def run_k2():
    print("-- K2: one-hot reduce, wide vs per-subchunk split", flush=True)
    key = jax.random.PRNGKey(3)
    CH, U, nsteps, W = 1024, 16, 62, 128
    m_pad = 10_000 + W + 8
    tot = nsteps * CH * U
    # sub-chunk u of step i accumulates into window starting at a
    # 128-aligned base, rows are window-relative in [0, W)
    nch = nsteps * U
    r0s_np = (np.random.default_rng(0).integers(0, (10_000 - W) // 128,
                                                nch) * 128).astype(np.int32)
    r0s = jnp.asarray(r0s_np)
    rows8 = jax.random.randint(key, (nsteps * CH, U), 0, W, INDEX
                               ).astype(jnp.int8)
    z = jax.random.uniform(jax.random.PRNGKey(4), (nsteps * CH, U),
                           jnp.float32)
    # correctness cross-check wide vs narrow
    y_w = k2_call(r0s, rows8, z, W, CH, U, nsteps, m_pad, True)
    y_n = k2_call(r0s, rows8, z, W, CH, U, nsteps, m_pad, False)
    dif = float(jnp.max(jnp.abs(y_w - y_n)))
    print(f"   wide-vs-narrow max abs diff: {dif:.2e}", flush=True)
    for wide in (False, True):
        def body(c, wide=wide):
            y = k2_call(r0s, rows8, c, W, CH, U, nsteps, m_pad, wide)
            return c + 1e-30 * jnp.max(y)
        bench_scan(f"k2 wide={wide} W={W}", body, z, nslots=tot)
    # i8 vs i32 row stream
    rows32 = rows8.astype(INDEX)

    def body32(c):
        y = k2_call(r0s, rows32, c, W, CH, U, nsteps, m_pad, True)
        return c + 1e-30 * jnp.max(y)
    bench_scan("k2 wide=True rows=i32", body32, z, nslots=tot)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    run_k1()
    run_k2()


if __name__ == "__main__":
    main()
