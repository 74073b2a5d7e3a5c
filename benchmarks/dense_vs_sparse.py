#!/usr/bin/env python
"""Dense GEMM vs sparse SpGEMM break-even sweep (kernel-only).

TPU re-build of /root/reference dense_vs_sparseGEMM/main.py + utils.py:
inputs pre-staged on device, kernel-only timing, OOM-tolerant sweep over
size × density; reports the break-even density (where dense matmul on the
MXU overtakes the sparse path).

Usage: python benchmarks/dense_vs_sparse.py --size 1024 4096 \
           --density 0.001 0.01 0.05 0.1 --runs 50
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.utils import profiler  # noqa: E402


@jax.jit
def _dense_mm(a, b):
    return jnp.dot(a, b, preferred_element_type=a.dtype,
                   precision=jax.lax.Precision.HIGHEST)


def run_case(size, density, runs, dtype, seed, alg, op="spgemm",
             ncols=None):
    m = k = n = size
    A = st.random(m, k, density, format="csr", dtype=dtype, random_state=seed)
    out = {}
    if op == "spmm":
        # CSR@dense vs dense GEMM (BASELINE.json configs[1])
        nd = ncols or size
        Bd = jnp.ones((k, nd), dtype)
        Ad = A.toarray()
        r = profiler.repeat_op(f"dense-gemm n={size} d={density}",
                               lambda: _dense_mm(Ad, Bd), runs=runs,
                               warmup=3)
        if r:
            out["dense"] = r
            print(r.row())
        r = profiler.repeat_op(
            f"spmm(csr) n={size} d={density}",
            lambda: st.spmm(A, Bd, via="csr"), runs=runs, warmup=3)
        if r:
            out["sparse"] = r
            print(r.row())
        return out
    B = st.random(k, n, density, format="csr", dtype=dtype,
                  random_state=seed + 1)
    Ad, Bd = A.toarray(), B.toarray()
    r = profiler.repeat_op(f"dense n={size} d={density}",
                           lambda: _dense_mm(Ad, Bd), runs=runs, warmup=3)
    if r:
        out["dense"] = r
        print(r.row())
    r = profiler.repeat_op(
        f"sparse(alg{alg}) n={size} d={density}",
        lambda: st.spgemm(A, B, alg=alg).data, runs=runs, warmup=3)
    if r:
        out["sparse"] = r
        print(r.row())
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs="+",
                   default=[1024, 2048, 4096, 8192])
    p.add_argument("--density", type=float, nargs="+",
                   default=[0.001, 0.005, 0.01, 0.05, 0.1])
    p.add_argument("--runs", type=int, default=50)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--alg", type=int, default=2,
                   help="sparse alg for the comparison (2=ESC is the true "
                        "sparse path; 1 would itself use the MXU)")
    p.add_argument("--op", choices=["spgemm", "spmm"], default="spgemm",
                   help="spgemm: CSR@CSR vs dense; spmm: CSR@dense vs dense")
    p.add_argument("--ncols", type=int, default=None,
                   help="dense B columns for --op spmm (default: size)")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)
    crossovers = {}
    for size in args.size:
        prev = None
        for density in args.density:
            print(f"=== dense-vs-sparse: n={size} density={density} ===")
            res = run_case(size, density, args.runs, dtype, args.seed,
                           args.alg, op=args.op, ncols=args.ncols)
            if args.json and res:
                print(json.dumps({
                    "bench": "dense_vs_sparse", "size": size,
                    "density": density,
                    "dense_ms": res.get("dense") and res["dense"].median_ms,
                    "sparse_ms": res.get("sparse") and res["sparse"].median_ms,
                }))
            if ("dense" in res and "sparse" in res and prev is not None
                    and size not in crossovers):
                was_faster = prev
                now_faster = res["sparse"].median_ms < res["dense"].median_ms
                if was_faster and not now_faster:
                    crossovers[size] = density
            prev = ("dense" in res and "sparse" in res
                    and res["sparse"].median_ms < res["dense"].median_ms)
            profiler.cleanup_device()
    if crossovers:
        print("break-even densities:", crossovers)


if __name__ == "__main__":
    main()
