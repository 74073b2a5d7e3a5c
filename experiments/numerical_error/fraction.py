#!/usr/bin/env python
"""Max |C_alg1 − C_alg3| vs chunk_fraction.

TPU re-build of /root/reference numerical_error/fraction.py:18-38
(chunk_fraction ∈ {0.05 .. 1.0}).
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
    p.add_argument("--fractions", type=float, nargs="+",
                   default=[0.05, 0.1, 0.2, 0.3, 0.5, 0.7, 1.0])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="error_vs_fraction.png")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()

    A = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed)
    B = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed + 1)
    C1 = np.asarray(st.spgemm(A, B, alg=1).toarray())
    errs = []
    for cf in args.fractions:
        C3 = np.asarray(st.spgemm(A, B, alg=3, chunk_fraction=cf).toarray())
        err = np.abs(C1 - C3).max()
        errs.append(err)
        print(f"chunk_fraction={cf}: max err {err:.3e}")
    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.plot(args.fractions, errs, "o-")
        plt.xlabel("chunk_fraction")
        plt.ylabel("max |C_alg1 − C_alg3|")
        plt.yscale("log")
        plt.title(f"n={args.size} ρ={args.density}")
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
