#!/usr/bin/env python
"""SpMV lab 2: primitive costs for a gather-based SpMV kernel.

Measures (in-scan, overhead-subtracted):
  1. same-shape Mosaic lane gather (8,128)/(128,128) blocks — ns/slot
  2. gather + transpose + gather (the two-stage x-fetch)
  3. int8 MXU dot feasibility + rate vs bf16
"""

import functools
import statistics
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

INDEX = jnp.int32
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
        extra = (f"  {med * 1e6 / nslots:8.3f} ns/slot = "
                 f"{nslots / med / 1e6:8.3f} G/s")
    print(f"  {name:<40s} {med:9.4f} ms{extra}", flush=True)
    return med


# --- 1/2: same-shape lane gather chains ------------------------------------

def _mk_gather_kernel(S, U, stages):
    def kern(x_ref, i1_ref, i2_ref, o_ref):
        for j in range(U):
            sl = slice(j * S, (j + 1) * S)
            i1 = i1_ref[sl, :]
            t = jnp.take_along_axis(x_ref[...], i1, axis=1)
            if stages == 2:
                t = jnp.take_along_axis(t.T, i2_ref[sl, :], axis=1)
            o_ref[sl, :] = t
    return kern


@functools.partial(jax.jit, static_argnames=("S", "U", "nblk", "stages"))
def gather_chain(x, i1, i2, S, U, nblk, stages):
    nsteps = nblk // U
    return pl.pallas_call(
        _mk_gather_kernel(S, U, stages),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((S, 128), lambda i: (0, 0)),
                  pl.BlockSpec((U * S, 128), lambda i: (i, 0)),
                  pl.BlockSpec((U * S, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((U * S, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((nblk * S, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x, i1, i2)


# --- 3: int8 MXU dot --------------------------------------------------------

def _i8dot_kernel(a_ref, b_ref, o_ref, *, U):
    acc = jnp.zeros_like(o_ref)
    for j in range(U):
        a = a_ref[j * 1024:(j + 1) * 1024, :]
        acc += lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("U", "nblk", "N"))
def i8dot(a, b, U, nblk, N):
    nsteps = nblk // U
    return pl.pallas_call(
        functools.partial(_i8dot_kernel, U=U),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((U * 1024, 128), lambda i: (i, 0)),
                  pl.BlockSpec((128, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1024, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1024, N), jnp.int32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(a, b)


def _bf16dot_kernel(a_ref, b_ref, o_ref, *, U):
    acc = jnp.zeros_like(o_ref)
    for j in range(U):
        a = a_ref[j * 1024:(j + 1) * 1024, :]
        acc += lax.dot_general(a, b_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("U", "nblk", "N"))
def bf16dot(a, b, U, nblk, N):
    nsteps = nblk // U
    return pl.pallas_call(
        functools.partial(_bf16dot_kernel, U=U),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec((U * 1024, 128), lambda i: (i, 0)),
                  pl.BlockSpec((128, N), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1024, N), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1024, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(a, b)


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    # 1M slots in (S,128) blocks
    for S in (8, 128):
        nblk = (1 << 20) // (S * 128)
        U = min(16, nblk)
        nblk = (nblk // U) * U
        nslots = nblk * S * 128
        x = jax.random.uniform(key, (S, 128), jnp.float32)
        i1 = jax.random.randint(jax.random.PRNGKey(1), (nblk * S, 128),
                                0, 128, INDEX)
        i2 = jax.random.randint(jax.random.PRNGKey(2), (nblk * S, 128),
                                0, 128, INDEX)
        for stages in ((1, 2) if S == 128 else (1,)):
            try:
                def body(c, S=S, U=U, nblk=nblk, stages=stages,
                         i1=i1, i2=i2):
                    g = gather_chain(c, i1, i2, S, U, nblk, stages)
                    return c + 0.0 * jnp.max(g)
                bench_scan(f"take_along S={S} stages={stages}",
                           body, x, nslots=nslots)
            except Exception as e:  # noqa: BLE001
                print(f"   S={S} stages={stages}: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    # int8 vs bf16 MXU rate: (1024,128) @ (128, N)
    for N in (128, 512):
        nblk = 256
        U = 16
        macs = nblk * 1024 * 128 * N
        try:
            a8 = jax.random.randint(key, (nblk * 1024, 128), -127, 127,
                                    jnp.int8)
            b8 = jax.random.randint(jax.random.PRNGKey(3), (128, N),
                                    -127, 127, jnp.int8)

            def body8(c, U=U, nblk=nblk, N=N, b8=b8):
                r = i8dot(c, b8, U, nblk, N)
                return c + (0 * jnp.max(r)).astype(jnp.int8)
            t = bench_scan(f"i8dot N={N}", body8, a8)
            print(f"    -> {macs / t / 1e9:.1f} GMAC/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"   i8dot N={N}: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
        ab = jax.random.uniform(key, (nblk * 1024, 128),
                                jnp.float32).astype(jnp.bfloat16)
        bb = jax.random.uniform(jax.random.PRNGKey(3), (128, N),
                                jnp.float32).astype(jnp.bfloat16)

        def bodyb(c, U=U, nblk=nblk, N=N, bb=bb):
            r = bf16dot(c, bb, U, nblk, N)
            return c + (0 * jnp.max(r)).astype(jnp.bfloat16)
        t = bench_scan(f"bf16dot N={N}", bodyb, ab)
        print(f"    -> {macs / t / 1e9:.1f} GMAC/s", flush=True)


if __name__ == "__main__":
    main()
