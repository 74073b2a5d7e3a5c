#!/usr/bin/env python
"""SpGEMM vs SpMV, CPU (SciPy) vs TPU, across format pairs.

TPU re-build of /root/reference SpGEMM_vs_SpMV/profiler.py: for all 9 format
pairs {csr,csc,coo}² run SpGEMM, plus SpMV A@v for each A format; CPU side
measured in forked child processes for clean RSS (profiler.py:94-178), TPU
side end-to-end including H2D transfer inside the timed closure
(profiler.py:203-238 keeps the upload inside the timed fn).

Usage: python benchmarks/spgemm_vs_spmv.py --size 512 --density 0.1 --runs 20
"""

import argparse
import itertools
import json
import os
import pickle
import resource
import statistics
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import spmm_tpu as st  # noqa: E402
from spmm_tpu.utils import profiler  # noqa: E402

FORMATS = ["csr", "csc", "coo"]


def profile_op_cpu(fn, runs):
    """Run `fn` in a forked child per repeat: wall time + ΔmaxRSS, immune to
    allocator reuse in the parent (the _profile_in_child pattern,
    SpGEMM_vs_SpMV/profiler.py:94-178)."""
    times = []
    peak = 0
    for _ in range(runs):
        r, w = os.pipe()
        pid = os.fork()
        if pid == 0:
            os.close(r)
            rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) * 1e3
            rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            os.write(w, pickle.dumps((dt, rss1 - rss0)))
            os.close(w)
            os._exit(0)
        os.close(w)
        buf = b""
        while True:
            chunk = os.read(r, 65536)
            if not chunk:
                break
            buf += chunk
        os.close(r)
        os.waitpid(pid, 0)
        dt, drss = pickle.loads(buf)
        times.append(dt)
        peak = max(peak, drss)
    return statistics.median(times), peak


def gen_cpu(size, density, fmt, seed):
    rng = np.random.default_rng(seed)
    A = sp.random(size, size, density=density, format=fmt,
                  random_state=np.random.RandomState(seed),
                  dtype=np.float32)
    return A


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, nargs="+", default=[256, 512, 1024])
    p.add_argument("--density", type=float, nargs="+",
                   default=[0.01, 0.1, 0.5])
    p.add_argument("--runs", type=int, default=20)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)
    best = {}
    for size, density in itertools.product(args.size, args.density):
        print(f"=== SpGEMM vs SpMV: n={size} d={density} ===")
        rows = []
        for fa, fb in itertools.product(FORMATS, FORMATS):
            Acpu = gen_cpu(size, density, fa, args.seed)
            Bcpu = gen_cpu(size, density, fb, args.seed + 1)
            cpu_ms, cpu_rss = profile_op_cpu(lambda: Acpu @ Bcpu, args.runs)
            # TPU end-to-end: H2D (device_put of host triplets) inside the
            # timed closure, like the reference's to_gpu_sparse-in-closure
            Ah = (np.asarray(Acpu.tocoo().row), np.asarray(Acpu.tocoo().col),
                  np.asarray(Acpu.tocoo().data))
            Bh = (np.asarray(Bcpu.tocoo().row), np.asarray(Bcpu.tocoo().col),
                  np.asarray(Bcpu.tocoo().data))

            def tpu_op():
                A = st.COO((Ah[2], (Ah[0], Ah[1])),
                           shape=Acpu.shape).asformat(fa)
                B = st.COO((Bh[2], (Bh[0], Bh[1])),
                           shape=Bcpu.shape).asformat(fb)
                return (A @ B).data

            r = profiler.repeat_op(
                f"spgemm {fa}@{fb} n={size} d={density}", tpu_op,
                runs=args.runs, warmup=2)
            tpu_ms = r.median_ms if r else float("nan")
            rows.append((f"{fa}@{fb}", cpu_ms, tpu_ms))
            print(f"  {fa}@{fb}: cpu {cpu_ms:8.3f} ms | tpu {tpu_ms:8.3f} ms"
                  f" | speedup {cpu_ms / tpu_ms:6.2f}x")
            if args.json:
                print(json.dumps({
                    "bench": "spgemm_vs_spmv", "op": "spgemm",
                    "pair": f"{fa}@{fb}", "size": size, "density": density,
                    "cpu_ms": cpu_ms, "tpu_ms": tpu_ms}))
        # SpMV per A format
        v = np.random.default_rng(9).random(size, dtype=np.float32)
        for fa in FORMATS:
            Acpu = gen_cpu(size, density, fa, args.seed)
            cpu_ms, _ = profile_op_cpu(lambda: Acpu @ v, args.runs)
            coo = Acpu.tocoo()
            Ah = (np.asarray(coo.row), np.asarray(coo.col),
                  np.asarray(coo.data))

            def tpu_op():
                A = st.COO((Ah[2], (Ah[0], Ah[1])),
                           shape=Acpu.shape).asformat(fa)
                return st.spmv(A, jnp.asarray(v))

            r = profiler.repeat_op(f"spmv {fa} n={size} d={density}",
                                   tpu_op, runs=args.runs, warmup=2)
            tpu_ms = r.median_ms if r else float("nan")
            print(f"  spmv[{fa}]: cpu {cpu_ms:8.3f} ms | tpu "
                  f"{tpu_ms:8.3f} ms | speedup {cpu_ms / tpu_ms:6.2f}x")
            if args.json:
                print(json.dumps({
                    "bench": "spgemm_vs_spmv", "op": "spmv", "pair": fa,
                    "size": size, "density": density,
                    "cpu_ms": cpu_ms, "tpu_ms": tpu_ms}))
        # best combo summary (print_best_combos analogue, profiler.py:241)
        fastest = min(rows, key=lambda r: r[2])
        print(f"  best TPU spgemm pair: {fastest[0]} @ {fastest[2]:.3f} ms")
        profiler.cleanup_device()


if __name__ == "__main__":
    main()
