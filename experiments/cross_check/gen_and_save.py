#!/usr/bin/env python
"""Generate seeded A, B; compute C with the framework's ESC SpGEMM; dump all
three as text for the native cross-check.

TPU re-build of /root/reference cupy_cusparse/gen_and_save_alg{1,2,3}_txt.py
(seeded generation at :22-36, text dump protocol at :8-15).
"""

import argparse
import sys

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.sparse import io  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--density", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--alg", type=int, default=2, choices=[1, 2, 3])
    p.add_argument("--chunk-fraction", type=float, default=0.2)
    p.add_argument("--prefix", default="/tmp/spmm_crosscheck")
    args = p.parse_args()

    A = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed)
    B = st.random(args.size, args.size, args.density, format="csr",
                  random_state=args.seed + 1)
    # alg 2/3: the native binary replays the ESC expansion/doubling-tree
    # bitwise, so pin the ESC engine regardless of the auto dispatcher.
    # alg 1: the dense-intermediate result is checked structurally bitwise
    # + values to tolerance (native --alg1 mode).
    impl = "esc" if args.alg in (2, 3) else "auto"
    C = st.spgemm(A, B, alg=args.alg, chunk_fraction=args.chunk_fraction,
                  impl=impl)
    io.save_csr_txt(args.prefix + "_A", A)
    io.save_csr_txt(args.prefix + "_B", B)
    io.save_csr_txt(args.prefix + "_C_py", C)
    print(f"saved A ({A.nnz} nnz), B ({B.nnz} nnz), "
          f"C_py ({C.nnz} nnz, alg={args.alg}) to {args.prefix}_*")


if __name__ == "__main__":
    main()
