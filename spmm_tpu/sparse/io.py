"""CSR serialization: the cross-process text format + npz.

The text format is byte-compatible with the reference's cross-check protocol
(/root/reference cupy_cusparse/gen_and_save_alg1_txt.py:8-15 and the C++
reader spgemm_from_txt_alg1.cu:54-78): for a matrix ``prefix`` three files
``prefix_indptr.txt`` / ``prefix_indices.txt`` / ``prefix_data.txt``, one
value per line, ints as ``%d`` and floats as ``%.9g``.  This is what the
determinism suite diffs and what the native C++ cross-check program reads.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

from spmm_tpu.sparse.csr import CSR


def save_csr_txt(prefix: str, a: CSR) -> None:
    a = a.tocsr()
    np.savetxt(prefix + "_indptr.txt", np.asarray(a.indptr), fmt="%d")
    np.savetxt(prefix + "_indices.txt", np.asarray(a.indices), fmt="%d")
    np.savetxt(prefix + "_data.txt", np.asarray(a.data), fmt="%.9g")
    with open(prefix + "_shape.txt", "w") as f:
        f.write(f"{a.shape[0]} {a.shape[1]}\n")


def load_csr_txt(prefix: str, shape: Tuple[int, int] = None) -> CSR:
    indptr = np.loadtxt(prefix + "_indptr.txt", dtype=np.int32, ndmin=1)
    indices = np.loadtxt(prefix + "_indices.txt", dtype=np.int32, ndmin=1)
    data = np.loadtxt(prefix + "_data.txt", dtype=np.float32, ndmin=1)
    if shape is None:
        shape_file = prefix + "_shape.txt"
        if os.path.exists(shape_file):
            with open(shape_file) as f:
                m, n = map(int, f.read().split())
            shape = (m, n)
        else:
            m = len(indptr) - 1
            n = int(indices.max()) + 1 if len(indices) else 0
            shape = (m, n)
    return CSR.from_parts(indptr, indices, data, shape, canonical=True)


def save_npz(path: str, a) -> None:
    a = a.tocsr()
    np.savez_compressed(
        path,
        format="csr",
        shape=np.asarray(a.shape, np.int64),
        indptr=np.asarray(a.indptr),
        indices=np.asarray(a.indices),
        data=np.asarray(a.data),
    )


def load_npz(path: str) -> CSR:
    with np.load(path) as f:
        return CSR.from_parts(f["indptr"], f["indices"], f["data"],
                              tuple(f["shape"]), canonical=True)


def csrs_txt_equal(prefix_a: str, prefix_b: str) -> bool:
    """Bitwise comparison of two text dumps (compare_csrs_txt.py:20-47)."""
    a = load_csr_txt(prefix_a)
    b = load_csr_txt(prefix_b)
    return (
        a.shape == b.shape
        and np.array_equal(np.asarray(a.indptr), np.asarray(b.indptr))
        and np.array_equal(np.asarray(a.indices), np.asarray(b.indices))
        and np.array_equal(np.asarray(a.data), np.asarray(b.data))
    )


# Persisted-plan format version.  Bump whenever a plan's on-disk encoding
# changes meaning (the arrays would load cleanly but decode wrong):
#   v1: original routed seg words (g1<<5 | bnd)
#   v2: round-3 routed seg words (g1<<18 | g2<<5 | bnd), routed value
#       layout, int8/int16 hi tables.  A v1 plan decoded by the v2 kernel
#       silently accumulates all prefix segments into row group 0.
#   v3: round-4 stacked row-groups — route_tbl carries a sub-row tag in
#       bits 7.. when S > 1 and r0s holds SUPER-group base rows; a v2
#       plan has no S field and an S>1 v3 plan decoded by a v2 kernel
#       would treat tag bits as sublane indices.
SPMV_PLAN_FORMAT_VERSION = 3


def save_spmv_plan(path: str, plan) -> None:
    """Persist a tagged `spmv_plan` result (the routed plan's
    edge-coloring analysis costs seconds at 1M nnz — serving setups
    build it once and reload; the analogue of persisting cuSPARSE's
    analysis buffers, which CUDA cannot do but a host-side plan can)."""
    tag, p = plan
    arrays = {f"f_{name}": np.asarray(v) if hasattr(v, "shape") else v
              for name, v in zip(p._fields, p) if v is not None}
    scalars = {k: v for k, v in arrays.items()
               if not isinstance(v, np.ndarray)}
    tensors = {k: v for k, v in arrays.items()
               if isinstance(v, np.ndarray)}
    np.savez(path, plan_tag=tag, plan_cls=type(p).__name__,
             plan_format_version=np.int64(SPMV_PLAN_FORMAT_VERSION),
             scalar_names=np.array(sorted(scalars)),
             scalar_vals=np.array([scalars[k] for k in sorted(scalars)],
                                  np.int64),
             **tensors)


def load_spmv_plan(path: str):
    """Inverse of `save_spmv_plan`; returns the tagged plan tuple.

    Raises ValueError on a plan saved under a different format version —
    the kernels decode packed words positionally, so a stale plan would
    produce wrong results silently; callers should re-run `spmv_plan`.
    """
    import jax.numpy as jnp

    from spmm_tpu.ops.kernels.spmv_binned import SpmvBinnedPlan
    from spmm_tpu.ops.kernels.spmv_routed import SpmvRoutedPlan

    with np.load(path) as f:
        ver = int(f["plan_format_version"]) if "plan_format_version" in f \
            else 1
        # v2 plans decode identically under v3: S defaults to 1 and the
        # r0s/route/seg encodings are unchanged at S == 1 (the documented
        # hazard is only v3 S>1 plans read by v2 code, which the version
        # field prevents on that side) — so accept them rather than force
        # a full re-analysis (seconds to ~7 s at 32M nnz).
        if ver not in (2, SPMV_PLAN_FORMAT_VERSION):
            raise ValueError(
                f"spmv plan at {path!r} has format version {ver}, this "
                f"build expects {SPMV_PLAN_FORMAT_VERSION}; re-run "
                f"spmv_plan() and re-save (packed seg/table encodings "
                f"changed between versions)")
        tag = str(f["plan_tag"])
        cls = {"SpmvRoutedPlan": SpmvRoutedPlan,
               "SpmvBinnedPlan": SpmvBinnedPlan}[str(f["plan_cls"])]
        scalars = dict(zip((str(s) for s in f["scalar_names"]),
                           (int(v) for v in f["scalar_vals"])))
        kwargs = {}
        for name in cls._fields:
            key = f"f_{name}"
            if key in scalars:
                kwargs[name] = scalars[key]
            elif key in f:
                kwargs[name] = jnp.asarray(f[key])
            # else: optional field absent (None/default at save time)
        return (tag, cls(**kwargs))
