#!/usr/bin/env python
"""Max |C_ref − C_alg3| vs chunk_fraction.

TPU re-build of /root/reference numerical_error/fraction.py:18-38
(chunk_fraction ∈ {0.05 .. 1.0}).

`--ref alg1` (default) compares dense intermediates like the reference
study; `--ref f64` compares alg3's f32 output against an exact float64
SciPy product on the sparse structure — the only valid baseline at
dense-infeasible shapes (e.g. 50000²/1e-4, the ESC regime), where no
dense C exists to diff against.
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
    p.add_argument("--ref", choices=["alg1", "f64"], default="alg1")
    p.add_argument("--out", default="error_vs_fraction.png")
    p.add_argument("--no-plot", action="store_true")
    args = p.parse_args()

    A = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed)
    B = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed + 1)
    if args.ref == "alg1":
        C1 = np.asarray(st.spgemm(A, B, alg=1).toarray())
    else:
        from scipy import sparse as sp

        A64 = sp.csr_matrix((np.asarray(A.data, np.float64),
                             np.asarray(A.indices), np.asarray(A.indptr)),
                            shape=A.shape)
        B64 = sp.csr_matrix((np.asarray(B.data, np.float64),
                             np.asarray(B.indices), np.asarray(B.indptr)),
                            shape=B.shape)
        C1 = A64 @ B64
        C1.sum_duplicates()
        C1.sort_indices()
    errs = []
    for cf in args.fractions:
        C3 = st.spgemm(A, B, alg=3, chunk_fraction=cf)
        if args.ref == "alg1":
            err = np.abs(C1 - np.asarray(C3.toarray())).max()
        else:
            # structures must agree exactly (same numeric-zero handling:
            # ESC keeps explicit accidental zeros, scipy does too)
            assert np.array_equal(np.asarray(C3.indptr), C1.indptr)
            assert np.array_equal(np.asarray(C3.indices), C1.indices)
            err = np.abs(np.asarray(C3.data, np.float64) - C1.data).max()
        errs.append(err)
        print(f"chunk_fraction={cf}: max err {err:.3e}", flush=True)
    if not args.no_plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(6, 4))
        plt.plot(args.fractions, errs, "o-")
        plt.xlabel("chunk_fraction")
        plt.ylabel(f"max |C_{args.ref} − C_alg3|")
        plt.yscale("log")
        plt.title(f"n={args.size} ρ={args.density} (ref={args.ref})")
        plt.tight_layout()
        plt.savefig(args.out, dpi=120)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
