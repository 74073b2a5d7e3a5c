#!/usr/bin/env python
"""SpGEMM ALG1/2/3 time-vs-peak-HBM comparison sweep.

TPU re-build of /root/reference SpGEMM_alg_comparison/profiler.py: for each
size × density, run `spgemm(A, B, alg)` for alg ∈ {1, 2, 3}, report median
time over N runs and ΔPeak-HBM (profiler.py:165-230 prints the same table
for ΔPeak-VRAM).

Usage: python benchmarks/alg_comparison.py --size 1024 --density 0.1 \
           --runs 100 [--chunk-fraction 0.2] [--dtype float32] [--seed 2008]
"""

import argparse
import itertools
import json
import sys

import jax.numpy as jnp

sys.path.insert(0, ".")  # repo root

import spmm_tpu as st  # noqa: E402
from spmm_tpu.utils import profiler  # noqa: E402

# Reference cuSPARSE numbers read off the README figures (BASELINE.md):
# (size, density, alg) -> (ms, peak MB).  Unstated GPU, CUDA 13.
REFERENCE = {
    (512, 0.1, 1): (0.8249, 36), (512, 0.1, 2): (0.8282, 18),
    (512, 0.1, 3): (1.7112, 20),
    (512, 0.5, 1): (3.8035, 776), (512, 0.5, 2): (4.8802, 370),
    (512, 0.5, 3): (7.2505, 318),
    (1024, 0.1, 1): (2.1494, 258), (1024, 0.1, 2): (2.4330, 174),
    (1024, 0.1, 3): (3.8103, 122),
    (1024, 0.5, 1): (67.0011, 6174), (1024, 0.5, 2): (74.4531, 4639),
    (1024, 0.5, 3): (100.9707, 2499),
}


def _loop_iters(size, density):
    """Two-K iteration counts sized so (k2-k1)·t_iter ≫ the relay's
    ±30 ms per-call jitter at every grid cell."""
    work = size * size * density
    if work <= 1024 * 1024 * 0.1 + 1:
        return 100, 500
    if size <= 2048:
        return 20, 100
    return 5, 25


def _replay_device_ms(A, B, alg, chunk_fraction, k1, k2):
    """Per-call device time of the full engine program chain (count +
    compute), measured by the generic memtrace replay under the two-K
    slope + checksum protocol (utils/devtime).  Host plan-time work is
    returned separately (one-shot wall, tunnel-inflated upper bound)."""
    from spmm_tpu.utils import devtime, memtrace

    t0 = __import__("time").perf_counter()
    with memtrace.trace() as records:
        out = st.spgemm(A, B, alg=alg, chunk_fraction=chunk_fraction)
        import jax

        jax.block_until_ready(out.data)
    wall = __import__("time").perf_counter() - t0
    ms = devtime.slope_ms(records, k1=k1, k2=k2, reps=5)
    return ms, records, wall


def _device_loop_ms(A, B, size, iters=100):
    """alg1 serving-path throughput: the bench.py protocol — K pipeline
    iterations inside one program, TWO-K slope (cancels the relay's
    fluctuating per-call overhead), integer-checksum feedback (XLA
    cannot fold it, unlike the round-2 `0.0 * slice` form)."""
    import statistics
    import time

    import jax
    from jax import lax

    from spmm_tpu.ops.spgemm import _alg1_fixed, alg1_onehot_plans

    cap = st.spgemm(A, B, alg=1).nnz
    oh = alg1_onehot_plans(A, B)

    def make(K):
        @jax.jit
        def loop(data_a):
            def body(d, _):
                _, col, dat, nnz = _alg1_fixed(
                    A.indptr, A.indices, d, B.indptr, B.indices, B.data,
                    jnp.float32(1.0), size, size, size, cap, "highest",
                    True, (None, None), False, oh)
                chk = jnp.bitwise_xor(
                    jax.lax.bitcast_convert_type(dat, jnp.int32),
                    col).sum()
                d2 = d + jnp.where(chk == jnp.int32(123456789),
                                   jnp.float32(1e-30), 0.0)
                return d2, nnz

            return lax.scan(body, data_a, None, length=K)
        return loop

    l1, l2 = make(iters), make(5 * iters)
    jax.block_until_ready(l1(A.data))
    jax.block_until_ready(l2(A.data))

    def run_reps(nreps):
        slopes = []
        for _ in range(nreps):
            t0 = time.perf_counter()
            jax.block_until_ready(l1(A.data))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(l2(A.data))
            t2 = time.perf_counter() - t0
            slopes.append((t2 - t1) * 1e3 / (4 * iters))
        return statistics.median(slopes)

    ms = run_reps(5)
    if ms <= 0.0:
        # impossible slope ⇒ the relay overhead spiked mid-measurement
        # (job 003 r4 recorded -0.0 here during a degraded-relay window)
        ms = run_reps(11)
    return ms


def measure_memory(A, B, alg, chunk_fraction):
    """Peak HBM per algorithm from XLA's buffer assignment
    (`utils.memtrace`), with the analytic model's prediction alongside —
    the TPU re-build of the reference's ΔPeak-VRAM sampler
    (SpGEMM_alg_comparison/profiler.py:82-133), exact instead of
    sampled."""
    from spmm_tpu.utils import memory_model, memtrace

    r = memtrace.op_memory_analysis(st.spgemm, A, B, alg=alg,
                                    chunk_fraction=chunk_fraction)
    est = memory_model.spgemm_peak_estimate(A, B, alg=alg,
                                            chunk_fraction=chunk_fraction)
    return r, est


def run_case(size, density, runs, chunk_fraction, dtype, seed, algs,
             device_loop=False, memory=False, serving=True):
    m = k = n = size
    A = st.random(m, k, density, format="csr", dtype=dtype,
                  random_state=seed)
    B = st.random(k, n, density, format="csr", dtype=dtype,
                  random_state=seed + 1)
    results = {}
    if device_loop:
        if serving and 1 in algs:
            # serving-path alg1 throughput (structure + densify plans
            # hoisted per structure) — bench.py's headline protocol
            serving_ms = _device_loop_ms(A, B, size)
            print(f"alg1 device-loop (serving path): "
                  f"{serving_ms:.4f} ms/multiply")
        else:
            serving_ms = None
        k1, k2 = _loop_iters(size, density)
        for alg in algs:
            ms, records, wall = _replay_device_ms(A, B, alg,
                                                  chunk_fraction, k1, k2)
            ref = REFERENCE.get((size, density, alg))
            vs = f"  vs_ref {ref[0] / ms:.2f}x" if ref else ""
            progs = "+".join(r.name for r in records)
            print(f"alg{alg} per-call device chain [{progs}]: "
                  f"{ms:.4f} ms/multiply (K={k1}/{k2}; one-shot wall "
                  f"{wall:.2f} s incl. plan+compile){vs}")
            results.setdefault(alg, {})["device_ms"] = ms
            results[alg]["programs"] = progs
            results[alg]["one_shot_wall_s"] = wall
        if 1 in results and serving_ms is not None:
            results[1]["serving_ms"] = serving_ms
    for alg in algs:
        if not device_loop:
            def op(alg=alg):
                return st.spgemm(A, B, alg=alg,
                                 chunk_fraction=chunk_fraction).data

            r = profiler.repeat_op(f"SpGEMM alg{alg} n={size} d={density}",
                                   op, runs=runs, warmup=3)
            if r is None:
                continue
            results.setdefault(alg, {})["time"] = r
            print(r.row())
        if memory:
            ma, est = measure_memory(A, B, alg, chunk_fraction)
            if ma["peak_bytes"] is not None:
                dev = (est["peak_bytes"] - ma["peak_bytes"]) \
                    / ma["peak_bytes"] * 100
                ref = REFERENCE.get((size, density, alg))
                refs = f"  (reference GPU: {ref[1]} MB)" if ref else ""
                print(f"    peak HBM (XLA buffer assignment): "
                      f"{ma['peak_mb']:.1f} MB  "
                      f"(model {est['peak_mb']:.1f} MB, {dev:+.0f}%){refs}")
                results.setdefault(alg, {})["memory"] = ma
                results[alg]["model"] = est
    return results


def _save_grid(path, grid_cells):
    """Merge cells into the grid JSON (incremental — called after every
    case so a timeout/crash cannot lose completed measurements)."""
    import os

    merged = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        for c in prev.get("cells", []):
            merged[(c["size"], c["density"], c["alg"])] = c
    for c in grid_cells:
        key = (c["size"], c["density"], c["alg"])
        merged.setdefault(key, {}).update(c)
    out = {
        "description": "SpGEMM alg-comparison grid: per-call device "
                       "ms (memtrace replay, two-K slope, checksum "
                       "chain) + XLA buffer-assignment peak bytes, "
                       "vs reference cuSPARSE (BASELINE.md).",
        "device": str(__import__("jax").devices()[0]),
        "cells": [merged[k] for k in sorted(merged)],
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    return len(merged)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs="+", default=[512, 1024])
    p.add_argument("--density", type=float, nargs="+", default=[0.1, 0.5])
    p.add_argument("--runs", type=int, default=100)
    p.add_argument("--chunk-fraction", type=float, default=0.2)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--seed", type=int, default=2008)
    p.add_argument("--algs", type=int, nargs="+", default=[1, 2, 3])
    p.add_argument("--device-loop", action="store_true",
                   help="also report alg1 device-loop throughput")
    p.add_argument("--no-serving", action="store_true",
                   help="with --device-loop: skip the alg1 serving-path "
                        "loop (replay chains only — big reference-free "
                        "cells)")
    p.add_argument("--memory", action="store_true",
                   help="also record per-alg peak HBM from XLA's buffer "
                        "assignment (the ΔPeak-VRAM column of the "
                        "reference's flagship figure)")
    p.add_argument("--json", action="store_true", help="emit one JSON line per case")
    p.add_argument("--save-grid", metavar="PATH", default=None,
                   help="append/overwrite cells in a grid JSON file "
                        "(e.g. benchmarks/grid_latest.json, which bench.py "
                        "attaches to its output line)")
    args = p.parse_args(argv)
    dtype = jnp.dtype(args.dtype)
    grid_cells = []
    for size, density in itertools.product(args.size, args.density):
        print(f"=== SpGEMM alg comparison: n={size} density={density} "
              f"runs={args.runs} ===")
        res = run_case(size, density, args.runs, args.chunk_fraction, dtype,
                       args.seed, args.algs, device_loop=args.device_loop,
                       memory=args.memory, serving=not args.no_serving)
        for alg, r in res.items():
            row = {
                "bench": "alg_comparison", "size": size,
                "density": density, "alg": alg,
            }
            if "time" in r:
                row["median_ms"] = r["time"].median_ms
                row["delta_hbm_bytes"] = r["time"].delta_hbm_bytes
            if "device_ms" in r:
                row["device_ms"] = round(r["device_ms"], 4)
                row["programs"] = r["programs"]
            if "serving_ms" in r:
                row["serving_ms"] = round(r["serving_ms"], 4)
            if "memory" in r:
                row["peak_hbm_bytes"] = r["memory"]["peak_bytes"]
                row["model_peak_bytes"] = r["model"]["peak_bytes"]
            ref = REFERENCE.get((size, density, alg))
            if ref:
                row["ref_ms"], row["ref_peak_mb"] = ref
            if args.json:
                print(json.dumps(row))
            grid_cells.append(row)
        profiler.cleanup_device()
        if args.save_grid:
            ncells = _save_grid(args.save_grid, grid_cells)
            print(f"grid saved: {args.save_grid} ({ncells} cells)")
            grid_cells = []


if __name__ == "__main__":
    main()
