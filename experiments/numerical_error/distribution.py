#!/usr/bin/env python
"""Histogram of elementwise |C_alg1 − C_alg3| for one configuration.

TPU re-build of /root/reference numerical_error/distribution.py:17-42
(1024², density 0.1, chunk_fraction 0.3 there).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--density", type=float, default=0.1)
    p.add_argument("--chunk-fraction", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="error_distribution.png")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()

    A = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed)
    B = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed + 1)
    C1 = st.spgemm(A, B, alg=1)
    C3 = st.spgemm(A, B, alg=3, chunk_fraction=args.chunk_fraction)
    diff = np.abs(np.asarray(C1.toarray()) - np.asarray(C3.toarray()))
    nz = diff[diff > 0]
    print(f"n={args.size} density={args.density} "
          f"cf={args.chunk_fraction}")
    print(f"max |C1-C3| = {diff.max():.3e}  mean = {diff.mean():.3e}  "
          f"nonzero diffs = {nz.size}")
    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(7, 4))
        if nz.size:
            plt.hist(np.log10(nz), bins=80)
        plt.xlabel("log10 |C_alg1 − C_alg3|")
        plt.ylabel("count")
        plt.title(f"SpGEMM alg1 vs alg3 error, n={args.size} "
                  f"ρ={args.density}")
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
