#!/usr/bin/env python
"""Worst-case max |C_alg1 − C_alg3| vs value range [0, high).

TPU re-build of /root/reference numerical_error/range.py:18-60
(high ∈ {1..10⁴}, 300 random repeats there).
"""

import argparse
import sys

import jax
import numpy as np

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--density", type=float, default=0.1)
    p.add_argument("--highs", type=float, nargs="+",
                   default=[1, 10, 100, 1000, 10000])
    # 300 repeats = the reference's protocol (range.py:18-60); use
    # --repeats to cut for quick runs
    p.add_argument("--repeats", type=int, default=300)
    p.add_argument("--chunk-fraction", type=float, default=0.3)
    p.add_argument("--out", default="error_vs_range.png")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()

    worst = []
    for high in args.highs:
        w = 0.0
        for rep in range(args.repeats):
            seed = rep * 2
            rvs = lambda key, shape, dt: jax.random.uniform(
                key, shape, dt, minval=0.0, maxval=high)
            A = st.random(args.size, args.size, args.density, format="csr",
                          random_state=seed, data_rvs=rvs)
            B = st.random(args.size, args.size, args.density, format="csr",
                          random_state=seed + 1, data_rvs=rvs)
            C1 = np.asarray(st.spgemm(A, B, alg=1).toarray())
            C3 = np.asarray(st.spgemm(
                A, B, alg=3, chunk_fraction=args.chunk_fraction).toarray())
            w = max(w, float(np.abs(C1 - C3).max()))
        worst.append(w)
        print(f"high={high}: worst max err {w:.3e}")
    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.plot(args.highs, worst, "o-")
        plt.xscale("log")
        plt.yscale("log")
        plt.xlabel("value range high")
        plt.ylabel("worst max |C_alg1 − C_alg3|")
        plt.title(f"n={args.size} ρ={args.density}, "
                  f"{args.repeats} repeats")
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
