"""Element-wise sparse arithmetic (add / subtract / multiply).

The reference inherits these from the container layer
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_data.py,
_compressed.py); here they are built on the same canonicalisation primitive
as everything else: concatenate COO triplets (for add) or intersect sorted
patterns (for multiply), then stable sort + fixed-order reduce.
"""

from __future__ import annotations

import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import issparse


def add(a, b):
    """a + b.  sparse+sparse stays sparse; sparse+dense densifies."""
    from spmm_tpu.sparse.coo import COO

    if not issparse(b):
        return a.toarray() + jnp.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch for add: {a.shape} vs {b.shape}")
    ca, cb = a.tocoo(), b.tocoo()
    row = jnp.concatenate([ca.row, cb.row])
    col = jnp.concatenate([ca.col, cb.col])
    data = jnp.concatenate([ca.data.astype(jnp.result_type(ca.dtype, cb.dtype)),
                            cb.data.astype(jnp.result_type(ca.dtype, cb.dtype))])
    out = COO.from_parts(row, col, data, a.shape).sum_duplicates()
    return out.asformat(a.format)


def multiply(a, b):
    """Element-wise (Hadamard) product."""
    from spmm_tpu.sparse.coo import COO

    if not issparse(b):
        b_arr = jnp.asarray(b)
        coo = a.tocoo()
        if b_arr.ndim == 0:
            return a._with_data(a.data * b_arr)
        if b_arr.ndim == 2 and b_arr.shape == a.shape:
            return a._with_data(coo.data * b_arr[coo.row, coo.col]).asformat(
                a.format)
        if b_arr.ndim == 1 and b_arr.shape[0] == a.shape[1]:
            # row-vector broadcast
            return a._with_data(coo.data * b_arr[coo.col]).asformat(a.format)
        if b_arr.ndim == 2 and b_arr.shape == (1, a.shape[1]):
            # (1, n) row broadcast (scipy semantics)
            return a._with_data(coo.data * b_arr[0, coo.col]).asformat(
                a.format)
        if b_arr.ndim == 2 and b_arr.shape == (a.shape[0], 1):
            # (m, 1) column broadcast
            return a._with_data(coo.data * b_arr[coo.row, 0]).asformat(
                a.format)
        raise ValueError("unsupported multiply broadcast")
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch for multiply: {a.shape} vs {b.shape}")
    # sparse ∘ sparse: intersection of canonical patterns via merge on the
    # concatenated sorted triplets — positions present in both get the
    # product of the two stored values.
    ca = a.tocoo().sum_duplicates()
    cb = b.tocoo().sum_duplicates()
    row = jnp.concatenate([ca.row, cb.row])
    col = jnp.concatenate([ca.col, cb.col])
    dtype = jnp.result_type(ca.dtype, cb.dtype)
    # mark origin: values from a carry (v, 0), from b carry (0, w) — after
    # sorting, a duplicate (row,col) pair holds one of each; the pairwise
    # product of segment-summed components is v*w, and singletons yield 0
    # (dropped).
    va = jnp.concatenate([ca.data.astype(dtype),
                          jnp.zeros_like(cb.data, dtype)])
    vb = jnp.concatenate([jnp.zeros_like(ca.data, dtype),
                          cb.data.astype(dtype)])
    row_s, col_s, (va_s, vb_s) = prim.lexsort_rowcol(
        row, col, (va, vb), a.shape)
    nout = int(prim.count_unique_sorted(row_s, col_s))
    r1, c1, da = prim.sum_duplicates_sorted(row_s, col_s, va_s, nout)
    _, _, db = prim.sum_duplicates_sorted(row_s, col_s, vb_s, nout)
    prod = da * db
    out = COO.from_parts(r1, c1, prod, a.shape, canonical=True)
    out = out.eliminate_zeros()
    return out.asformat(a.format)
