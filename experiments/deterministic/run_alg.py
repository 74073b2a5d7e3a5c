#!/usr/bin/env python
"""Generate seeded sparse matrices, run SpGEMM with one algorithm, dump the
result CSR as text.

TPU re-build of /root/reference deterministic/cupy_alg{1,2,3}.py (e.g.
cupy_alg2.py:15-33): for each size × density in the grid, A,B are generated
with a fixed seed, C = spgemm(A, B, alg) is computed and its
nnz/indices/indptr/data are appended to the output file.  Two independent
processes running this script must produce byte-identical files
(test_deterministic.sh diffs them).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402

SIZES = [32, 64, 128, 256, 512, 1024]
DENSITIES = [0.01, 0.1, 0.3, 0.5]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--alg", type=int, required=True, choices=[1, 2, 3])
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=2008)
    p.add_argument("--sizes", type=int, nargs="+", default=SIZES)
    p.add_argument("--densities", type=float, nargs="+", default=DENSITIES)
    p.add_argument("--chunk-fraction", type=float, default=0.2)
    args = p.parse_args()

    with open(args.out, "w") as f:
        for size in args.sizes:
            for density in args.densities:
                A = st.random(size, size, density, format="csr",
                              random_state=args.seed)
                B = st.random(size, size, density, format="csr",
                              random_state=args.seed + 1)
                C = st.spgemm(A, B, alg=args.alg,
                              chunk_fraction=args.chunk_fraction)
                f.write(f"# size={size} density={density} alg={args.alg}\n")
                f.write(f"nnz {C.nnz}\n")
                np.savetxt(f, np.asarray(C.indptr), fmt="%d")
                np.savetxt(f, np.asarray(C.indices), fmt="%d")
                # bitwise-comparable float encoding: raw bit pattern
                np.savetxt(f, np.asarray(C.data).view(np.uint32), fmt="%u")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
