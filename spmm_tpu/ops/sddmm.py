"""SDDMM: sampled dense-dense matmul — C = spy(S) ∘ (A @ B).

Not present in the reference harness but part of the cuSPARSE generic API
surface the reference binds (cusparse.pyx exposes the full generic op set);
included because it is the natural TPU companion op to SpMM (and the
building block for sparse attention).  Computed as per-entry dot products:
``out[t] = <A[row_t, :], B[:, col_t]> * S.data[t]``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spmm_tpu.utils import memtrace


@memtrace.jit
def _sddmm_gather(rows, cols, s_data, a, b):
    a_rows = a[rows, :]           # (nnz, k)
    b_cols = b[:, cols].T         # (nnz, k)
    dots = jnp.sum(a_rows * b_cols, axis=1)
    return s_data * dots


def sddmm(s, a, b, alpha=1.0):
    """Return a sparse matrix with S's pattern and values
    alpha * S.data * (A @ B) sampled at S's nonzeros."""
    from spmm_tpu.sparse.base import issparse

    if not issparse(s):
        raise TypeError("sddmm expects a sparse sampling matrix")
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    m, n = s.shape
    if a.shape[0] != m or b.shape[1] != n or a.shape[1] != b.shape[0]:
        raise ValueError(
            f"dimension mismatch: S {s.shape}, A {a.shape}, B {b.shape}")
    coo = s.tocoo()
    vals = alpha * _sddmm_gather(coo.row, coo.col, coo.data, a, b)
    return coo._with_data(vals).asformat(s.format)
