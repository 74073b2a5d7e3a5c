#!/usr/bin/env python
"""Component-level timing of the SpGEMM/SpMV pipelines on the current device.

Times each stage in isolation (jitted, block_until_ready) so optimization
effort goes where the time is: densify / value matmul / pattern matmul /
extract for alg1; expand / sort / compress for alg2; gather-segment SpMV vs
dense SpMV.
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402
import importlib
sg = importlib.import_module('spmm_tpu.ops.spgemm')  # noqa: E402


def timeit(name, fn, *args, runs=20):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    print(f"  {name:<40s} {statistics.median(ts):9.4f} ms")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--density", type=float, default=0.1)
    p.add_argument("--runs", type=int, default=20)
    args = p.parse_args()
    m = k = n = args.size
    print(f"device: {jax.devices()[0]}  n={args.size} d={args.density}")
    A = st.random(m, k, args.density, format="csr", random_state=0)
    B = st.random(k, n, args.density, format="csr", random_state=1)

    print("[alg1 components]")
    dens = jax.jit(lambda ip, ix, dv: prim.csr_to_dense_canonical(
        ip, ix, dv, (m, k)))
    Ad = timeit("densify A (scatter)", dens, A.indptr, A.indices, A.data,
                runs=args.runs)
    Bd = jax.jit(lambda ip, ix, dv: prim.csr_to_dense_canonical(
        ip, ix, dv, (k, n)))(B.indptr, B.indices, B.data)
    mm = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=a.dtype,
                                      precision=jax.lax.Precision.HIGHEST))
    Cd = timeit("value matmul f32 HIGHEST", mm, Ad, Bd, runs=args.runs)
    mmd = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=a.dtype))
    timeit("value matmul f32 DEFAULT", mmd, Ad, Bd, runs=args.runs)
    pat = jax.jit(lambda a, b: jnp.dot(
        (a != 0).astype(jnp.bfloat16), (b != 0).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    counts = timeit("pattern matmul bf16", pat, Ad, Bd, runs=args.runs)
    full = jax.jit(lambda aip, aix, adv, bip, bix, bdv: sg._alg1_dense_compute(
        aip, aix, adv, bip, bix, bdv, jnp.float32(1.0), m, k, n))
    c_dense, mask, nnz_dev = timeit(
        "alg1 fused compute", full, A.indptr, A.indices, A.data,
        B.indptr, B.indices, B.data, runs=args.runs)
    nnz = int(nnz_dev)
    timeit("alg1 extract (nonzero+gather)",
           lambda c, mk: sg._dense_extract(c, mk, nnz, m), c_dense, mask,
           runs=args.runs)
    print(f"  (nnz_C = {nnz})")

    print("[alg2 components]")
    counts2, ends = sg._work_estimation(A.indices, B.indptr)
    P = int(ends[-1])
    print(f"  (P = {P})")
    rowsA = A.rows
    expd = jax.jit(lambda ar, ai, ad, bip, bix, bdv, c, e: sg._expand(
        ar, ai, ad, bip, bix, bdv, c, e, P))
    row, col, val = timeit("expand", expd, rowsA, A.indices, A.data,
                           B.indptr, B.indices, B.data, counts2, ends,
                           runs=max(3, args.runs // 2))
    srt = jax.jit(lambda r, c, v: prim.lexsort_rowcol(r, c, (v,), (m, n)))
    row_s, col_s, (val_s,) = timeit("lexsort", srt, row, col, val,
                                    runs=max(3, args.runs // 2))
    nnz_c = int(sg._compress_count(row_s, col_s))
    timeit("compress (segsum tree)",
           lambda r, c, v: sg._compress(r, c, v, jnp.float32(1.0), nnz_c, m),
           row_s, col_s, val_s, runs=max(3, args.runs // 2))

    print("[spmv]")
    x = jnp.ones((k,), jnp.float32)
    timeit("csr gather+segsum", lambda: st.spmv(A, x), runs=args.runs)
    timeit("dense MXU spmv", lambda: st.spmv(A, x, via="dense"),
           runs=args.runs)
    timeit("spmm csr (nd=128)",
           lambda: st.spmm(A, jnp.ones((k, 128), jnp.float32)),
           runs=max(3, args.runs // 2))
    timeit("spmm dense (nd=128)",
           lambda: st.spmm(A, jnp.ones((k, 128), jnp.float32), via="dense"),
           runs=args.runs)

    print("[end-to-end]")
    timeit("spgemm alg1", lambda: st.spgemm(A, B, alg=1).data,
           runs=args.runs)
    timeit("spgemm alg2", lambda: st.spgemm(A, B, alg=2).data,
           runs=max(3, args.runs // 2))
    timeit("spgemm alg3 cf=0.2",
           lambda: st.spgemm(A, B, alg=3, chunk_fraction=0.2).data,
           runs=max(3, args.runs // 4))


if __name__ == "__main__":
    main()
