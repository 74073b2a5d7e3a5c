"""SpMV: y = alpha * A @ x  (CSR @ dense vector).

Re-provides `cupyx.cusparse.spmv` (/root/reference
modify_src/cupy-src/cupyx/cusparse.py:1373-1438) with its validation
semantics, as TPU-native compute:

  * default path: gather-multiply + row-segmented sum.  The segment ids come
    from indptr (sorted), so XLA lowers the reduction without a serialising
    combine; deterministic fixed-order accumulation.
  * `via="dense"`: densify A and ride the MXU — optimal whenever the matrix
    fits (the reference's own data shows SpMV is bandwidth/transfer-bound and
    GPU-loses-to-CPU at small sizes, BASELINE.md §SpMV).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.utils import memtrace


@memtrace.jit
def _csr_spmv(indptr, indices, data, x, alpha):
    nnz = data.shape[0]
    m = indptr.shape[0] - 1
    rows = prim.rows_from_indptr(indptr, nnz)
    prod = data * x[indices]
    y = jax.ops.segment_sum(prod, rows, num_segments=m,
                            indices_are_sorted=True)
    return alpha * y


@functools.partial(memtrace.jit, static_argnames=("ncols",))
def _csr_spmv_t(indptr, indices, data, x, alpha, *, ncols: int):
    """y = alpha * A.T @ x via scatter-add over column indices."""
    nnz = data.shape[0]
    rows = prim.rows_from_indptr(indptr, nnz)
    prod = data * x[rows]
    y = jax.ops.segment_sum(prod, indices, num_segments=ncols,
                            indices_are_sorted=False)
    return alpha * y


@memtrace.jit
def _dense_spmv(a_dense, x, alpha):
    return alpha * (a_dense @ x)


def spmv_onehot_plans(a):
    """Static Pallas SpMV plan for `a` (one indptr readback, cacheable),
    or None when the one-hot kernel does not apply."""
    from spmm_tpu.ops.kernels.spmv_onehot import spmv_onehot_plan

    if jax.default_backend() != "tpu":
        return None
    if a.dtype != jnp.float32:
        return None
    import numpy as np

    m, n = a.shape
    return spmv_onehot_plan(np.asarray(a.indptr), m, n)


def spmv_plan(a, effort: str = "auto"):
    """Preprocess `a` for repeated SpMV — the analogue of cuSPARSE's
    descriptor + analysis reuse (cusparse.py:1373-1438, the createDnVec/
    CsrMat + buffer sizing done once per structure).

    Plan preference (measured on v5e, BENCH_SUMMARY.md round 3):
    routed (kernels/spmv_routed, 13-36 Gnnz/s) > binned
    (kernels/spmv_binned, 1.5-1.7 Gnnz/s) > one-hot (0.5) > None
    (gather+segment-sum).  The routed plan's edge-coloring analysis
    runs in the native sequential-Koenig planner when
    native/libspmv_planner.so is available (~0.1 s at 1M nnz, 1.3 s at
    8M — round 3; the numpy fallback is ~1-4 s at 1M) and the plan is
    persistable via sparse.io.save_spmv_plan.  `effort` trades analysis
    for execution: "auto" (default) attempts routed up to 32M nnz with
    the native planner (8M without), "max" always, "fast" never (the
    per-call eager path uses "fast" — its binned analysis is
    milliseconds).  Returns an opaque tagged plan for
    `spmv(..., plan=...)`.

    Cross-environment caveat: the native and numpy planners produce
    DIFFERENT (both valid) lane assignments, hence different fixed f32
    summation trees — the same matrix yields bitwise-different (still
    correct, ~1 ulp apart) y depending on planner availability.  Each
    plan is bitwise-deterministic given the planner that built it, and
    persisting via `sparse.io.save_spmv_plan` freezes the assignment.
    For environment-independent bitwise comparisons, either ship the
    saved plan or pin `SPMM_TPU_NO_NATIVE_PLANNER=1` on every host."""
    from spmm_tpu.ops.kernels.spmv_binned import spmv_binned_plan

    if jax.default_backend() != "tpu" or a.dtype != jnp.float32:
        return None
    import numpy as np

    a = a.tocsr().sum_duplicates()
    m, n = a.shape
    iph = np.asarray(a.indptr)
    ixh = np.asarray(a.indices)
    dvh = np.asarray(a.data)
    if effort == "auto":
        from spmm_tpu.ops.kernels import _native_planner

        auto_cap = (1 << 25) if _native_planner.available() else (1 << 23)
    if effort == "max" or (effort == "auto" and a.nnz <= auto_cap):
        from spmm_tpu.ops.kernels.spmv_routed import spmv_routed_plan

        rp = spmv_routed_plan(iph, ixh, dvh, m, n)
        if rp is not None:
            return ("routed", rp)
    bp = spmv_binned_plan(iph, ixh, dvh, m, n)
    if bp is not None:
        return ("binned", bp)
    op = spmv_onehot_plans(a)
    return ("onehot", op) if op is not None else None


def spmv(a, x, alpha=1.0, transa: bool = False, via: str = "auto",
         plan=None):
    """y = alpha * op(A) @ x.

    Validation mirrors cusparse.spmv: A must be CSR (CSC handled via cheap
    transpose view), x a 1-D dense vector of matching length.

    `via`: "auto" (best Pallas kernel on TPU when applicable — binned
    lane-gather first, one-hot second — else gather+segment-sum),
    "binned", "onehot", "csr", or "dense".  `plan` may carry a cached
    `spmv_plan(a)` result to skip the per-call host analysis on serving
    paths.
    """
    from spmm_tpu.sparse.base import issparse
    from spmm_tpu.sparse.csc import CSC

    if not issparse(a):
        raise TypeError("spmv expects a sparse matrix A")
    if isinstance(a, CSC):
        # CSC(m,n) == CSR(n,m) transposed: flip transa
        a = a.transpose()  # CSR view, shape (n, m)
        transa = not transa
    a = a.tocsr()
    x = jnp.asarray(x)
    if x.ndim != 1:
        raise ValueError("spmv expects a 1-D dense vector x")
    m, n = a.shape
    expected = m if transa else n
    if x.shape[0] != expected:
        raise ValueError(
            f"dimension mismatch: op(A) {a.shape} (transa={transa}) @ x "
            f"{x.shape}")
    alpha = jnp.asarray(alpha, a.dtype)
    if via == "dense":
        ad = a.toarray()
        return _dense_spmv(ad.T if transa else ad, x, alpha)
    if not transa and via in ("auto", "onehot", "binned"):
        a = a.sum_duplicates()  # kernels require canonical entries
        if plan is not None and isinstance(plan, tuple) \
                and len(plan) == 2 \
                and plan[0] in ("routed", "binned", "onehot"):
            tag, p = plan
        elif plan is not None:
            tag, p = "onehot", plan   # legacy: bare onehot plan tuple
        elif via in ("auto", "binned"):
            tag, p = (spmv_plan(a, effort="fast") or (None, None))
        else:
            tag, p = "onehot", spmv_onehot_plans(a)
        if tag == "routed" and p is not None:
            from spmm_tpu.ops.kernels.spmv_routed import spmv_routed

            return alpha * spmv_routed(x, p)
        if tag == "binned" and p is not None:
            from spmm_tpu.ops.kernels.spmv_binned import spmv_binned

            return alpha * spmv_binned(x, p)
        if tag == "onehot" and p is not None:
            from spmm_tpu.ops.kernels.spmv_onehot import spmv_onehot

            y = spmv_onehot(a.indptr, a.indices, a.data, x, m, n, p)
            return alpha * y
        if via in ("onehot", "binned"):
            raise ValueError(f"spmv via={via!r} requested but the kernel "
                             "does not apply (non-TPU backend, non-f32 "
                             "data, or shapes outside the plan contract)")
    if transa:
        return _csr_spmv_t(a.indptr, a.indices, a.data, x, alpha, ncols=n)
    return _csr_spmv(a.indptr, a.indices, a.data, x, alpha)
