"""SpMM: C = alpha * op(A) @ B  (sparse @ dense matrix).

Re-provides `cupyx.cusparse.spmm` (/root/reference
modify_src/cupy-src/cupyx/cusparse.py:1440-1514).  The reference stages a
Fortran-ordered dense B into cuSPARSE (`_csr.py:218-225` calls
`asfortranarray`); on TPU the natural layouts are XLA's row-major tiles, so
no layout shuffle exists.

Paths:
  * ``via="csr"``   — gather rows of B by A's column indices, scale by A.data,
    segment-sum per output row.  O(nnz(A) * ncols(B)) work, bandwidth-bound;
    right answer in the very sparse regime.
  * ``via="bsr"``   — block-sparse A: each (R,C) block hits the MXU against a
    (C, N) slab of B.  TPU speed-of-light path for structured sparsity.
  * ``via="dense"`` — densify A and use one MXU matmul (wins at moderate
    density; the dispatch layer picks this from the measured break-even
    curve, BASELINE.md §break-even).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spmm_tpu.utils import memtrace

from spmm_tpu.ops import _primitives as prim


@memtrace.jit
def _csr_spmm(indptr, indices, data, b, alpha):
    nnz = data.shape[0]
    m = indptr.shape[0] - 1
    rows = prim.rows_from_indptr(indptr, nnz)
    gathered = b[indices, :] * data[:, None]
    out = jax.ops.segment_sum(gathered, rows, num_segments=m,
                              indices_are_sorted=True)
    return alpha * out


@memtrace.jit
def _dense_spmm(a_dense, b, alpha):
    return alpha * jnp.dot(a_dense, b, preferred_element_type=a_dense.dtype,
                           precision=jax.lax.Precision.HIGHEST)


@memtrace.jit
def _bsr_spmm(indptr, indices, blocks, b, alpha):
    """C = A_bsr @ B: per-block MXU matmuls accumulated per block-row."""
    nblocks, R, Cb = blocks.shape
    mb = indptr.shape[0] - 1
    brows = prim.rows_from_indptr(indptr, nblocks)
    # gather B slabs: (nblocks, Cb, N)
    n = b.shape[1]
    b_blocked = b.reshape(-1, Cb, n) if b.shape[0] % Cb == 0 else None
    if b_blocked is None:
        pad = (-b.shape[0]) % Cb
        b_pad = jnp.pad(b, ((0, pad), (0, 0)))
        b_blocked = b_pad.reshape(-1, Cb, n)
    slabs = b_blocked[indices]  # (nblocks, Cb, N)
    partial = jax.lax.dot_general(
        blocks, slabs,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=blocks.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )  # (nblocks, R, N)
    out = jax.ops.segment_sum(partial, brows, num_segments=mb,
                              indices_are_sorted=True)
    return alpha * out.reshape(mb * R, n)


def spmm(a, b, alpha=1.0, transa: bool = False, via: str = "csr",
         plan=None):
    """C = alpha * op(A) @ B with A sparse, B dense 2-D.

    `plan` may carry a `spmv_plan(a)` routed plan — the SpMM analogue
    of cuSPARSE's descriptor reuse (cusparse.py:1440-1514): A's routing
    tables stream once per 8-column block of B instead of per column
    (kernels/spmv_routed.spmm_routed)."""
    from spmm_tpu.sparse.base import issparse
    from spmm_tpu.sparse.bsr import BSR

    if not issparse(a):
        raise TypeError("spmm expects a sparse matrix A")
    b = jnp.asarray(b)
    if b.ndim != 2:
        raise ValueError("spmm expects a 2-D dense matrix B")
    if transa:
        a = a.transpose()
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    alpha = jnp.asarray(alpha, a.dtype)
    if (plan is not None and isinstance(plan, tuple) and len(plan) == 2
            and plan[0] == "routed" and not transa):
        from spmm_tpu.ops.kernels.spmv_routed import spmm_routed

        return alpha * spmm_routed(b, plan[1])
    if via == "dense":
        return _dense_spmm(a.tocsr().toarray(), b, alpha)
    if via == "bsr_pallas":
        from spmm_tpu.ops.kernels.bsr_spmm import spmm_bsr_pallas

        ab = a if isinstance(a, BSR) else a.tobsr()
        out = spmm_bsr_pallas(ab, b,
                              interpret=jax.default_backend() != "tpu")
        return alpha * out
    if via == "bsr" or isinstance(a, BSR):
        ab = a if isinstance(a, BSR) else a.tobsr()
        m = a.shape[0]
        out = _bsr_spmm(ab.indptr, ab.indices, ab.data, b, alpha)
        return out[:m, :]
    a = a.tocsr()
    return _csr_spmm(a.indptr, a.indices, a.data, b, alpha)
