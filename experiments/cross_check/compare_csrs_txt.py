#!/usr/bin/env python
"""Bitwise CSR text comparison: EQUAL/NOT EQUAL + exit code.

TPU re-build of /root/reference cupy_cusparse/compare_csrs_txt.py:20-47
(np.array_equal on indptr/indices AND data — bitwise, not allclose).
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")

from spmm_tpu.sparse import io  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prefix_a")
    p.add_argument("prefix_b")
    p.add_argument("--values-rtol", type=float, default=None,
                   help="compare data with this relative tolerance instead "
                        "of bitwise (ALG1 mode: structure stays bitwise, "
                        "values are reduction-order-dependent)")
    args = p.parse_args()

    a = io.load_csr_txt(args.prefix_a)
    b = io.load_csr_txt(args.prefix_b)
    if args.values_rtol is not None:
        data_ok = (np.asarray(a.data).shape == np.asarray(b.data).shape
                   and np.allclose(np.asarray(a.data), np.asarray(b.data),
                                   rtol=args.values_rtol,
                                   atol=args.values_rtol))
    else:
        data_ok = np.array_equal(
            np.asarray(a.data).view(np.uint32),
            np.asarray(b.data).view(np.uint32))
    checks = {
        "shape": a.shape == b.shape,
        "indptr": np.array_equal(np.asarray(a.indptr), np.asarray(b.indptr)),
        "indices": np.array_equal(np.asarray(a.indices),
                                  np.asarray(b.indices)),
        "data": data_ok,
    }
    for k, ok in checks.items():
        print(f"  {k}: {'EQUAL' if ok else 'NOT EQUAL'}")
    if all(checks.values()):
        print("EQUAL")
        return 0
    print("NOT EQUAL")
    if not checks["data"] and checks["indices"]:
        da = np.asarray(a.data)
        db = np.asarray(b.data)
        bad = np.nonzero(da != db)[0]
        print(f"  first data mismatch at {bad[0]}: {da[bad[0]]!r} vs "
              f"{db[bad[0]]!r} ({bad.size} total)")
    return 1


if __name__ == "__main__":
    sys.exit(main())
