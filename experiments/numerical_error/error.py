#!/usr/bin/env python
"""Heatmap of max-abs |C_alg1 − C_alg3| over sizes × densities.

TPU re-build of /root/reference numerical_error/error.py:16-48
(sizes {256,512,1024} × densities {0.01,0.1,0.5} there).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=[256, 512, 1024])
    p.add_argument("--densities", type=float, nargs="+",
                   default=[0.01, 0.1, 0.5])
    p.add_argument("--chunk-fraction", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="error_heatmap.png")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()

    errs = np.zeros((len(args.sizes), len(args.densities)))
    for i, size in enumerate(args.sizes):
        for j, density in enumerate(args.densities):
            A = st.random(size, size, density, format="csr",
                          random_state=args.seed)
            B = st.random(size, size, density, format="csr",
                          random_state=args.seed + 1)
            C1 = st.spgemm(A, B, alg=1)
            C3 = st.spgemm(A, B, alg=3,
                           chunk_fraction=args.chunk_fraction)
            diff = np.abs(np.asarray(C1.toarray())
                          - np.asarray(C3.toarray()))
            errs[i, j] = diff.max() if diff.size else 0.0
            print(f"n={size} d={density}: max err {errs[i, j]:.3e}")
    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(np.log10(np.maximum(errs, 1e-300)), cmap="viridis")
        ax.set_xticks(range(len(args.densities)), args.densities)
        ax.set_yticks(range(len(args.sizes)), args.sizes)
        ax.set_xlabel("density")
        ax.set_ylabel("size")
        for i in range(errs.shape[0]):
            for j in range(errs.shape[1]):
                ax.text(j, i, f"{errs[i, j]:.1e}", ha="center",
                        va="center", color="w", fontsize=8)
        fig.colorbar(im, label="log10 max |C1 − C3|")
        plt.title("SpGEMM alg1 vs alg3 max-abs error")
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
