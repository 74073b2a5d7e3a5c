"""CSR indexing: element access, row/column slicing, row selection.

Re-provides the core of the reference's fancy-indexing layer
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_index.py, 707 LoC):
`A[i]`, `A[i:j]`, `A[i, j]`, `A[:, j0:j1]`, `A[rows_array]`.  Built on the
same host-sizing + static-kernel pattern as the rest of the framework.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from spmm_tpu.ops import _primitives as prim

INDEX_DTYPE = prim.INDEX_DTYPE


def _getrow_slice(a, start: int, stop: int):
    """Contiguous row slice A[start:stop] — O(1) metadata + views."""
    from spmm_tpu.sparse.csr import CSR

    e0 = int(a.indptr[start])
    e1 = int(a.indptr[stop])
    indptr = a.indptr[start:stop + 1] - e0
    return CSR.from_parts(indptr, a.indices[e0:e1], a.data[e0:e1],
                          (stop - start, a.shape[1]),
                          canonical=a.has_canonical_format)


def _getitem_element(a, i: int, j: int):
    """A[i, j] — sum of matching entries in row i."""
    s = int(a.indptr[i])
    e = int(a.indptr[i + 1])
    seg_idx = a.indices[s:e]
    seg_dat = a.data[s:e]
    return jnp.sum(jnp.where(seg_idx == j, seg_dat, 0))


def _getrows_array(a, rows):
    """A[rows] for an integer array — gathers whole rows (host-sized)."""
    from spmm_tpu.sparse.csr import CSR

    rows = np.asarray(rows, np.int64)
    indptr_h = np.asarray(a.indptr)
    lens = indptr_h[rows + 1] - indptr_h[rows]
    out_indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int32)
    nnz_out = int(out_indptr[-1])
    if nnz_out == 0:
        return CSR.from_parts(out_indptr, np.zeros(0, np.int32),
                              np.zeros(0, np.asarray(a.data).dtype),
                              (len(rows), a.shape[1]), canonical=True)
    src = np.concatenate([
        np.arange(indptr_h[r], indptr_h[r + 1]) for r in rows
    ]).astype(np.int32)
    src_d = jnp.asarray(src)
    return CSR.from_parts(out_indptr, a.indices[src_d], a.data[src_d],
                          (len(rows), a.shape[1]),
                          canonical=a.has_canonical_format)


def _getcols_slice(a, j0: int, j1: int):
    """A[:, j0:j1] — filter entries by column range (host-sized)."""
    from spmm_tpu.sparse.csr import CSR

    keep = (a.indices >= j0) & (a.indices < j1)
    nnz_out = int(jnp.sum(keep))
    pos = prim.compact_positions(keep, nnz_out)
    rows = a.rows[pos]
    indptr = prim.build_indptr(rows, a.shape[0])
    return CSR.from_parts(indptr, a.indices[pos] - j0, a.data[pos],
                          (a.shape[0], j1 - j0),
                          canonical=a.has_canonical_format)


def csr_getitem(a, key):
    m, n = a.shape
    if isinstance(key, tuple) and len(key) == 2:
        ik, jk = key
        if isinstance(ik, (int, np.integer)) and isinstance(
                jk, (int, np.integer)):
            return _getitem_element(a, int(ik) % m, int(jk) % n)
        if isinstance(ik, slice) and ik == slice(None) and isinstance(
                jk, slice):
            j0, j1, step = jk.indices(n)
            if step != 1:
                raise NotImplementedError("strided column slicing")
            return _getcols_slice(a, j0, j1)
        if isinstance(ik, (int, np.integer)) and isinstance(jk, slice):
            row = _getrow_slice(a, int(ik) % m, int(ik) % m + 1)
            j0, j1, step = jk.indices(n)
            if step != 1:
                raise NotImplementedError("strided column slicing")
            return _getcols_slice(row, j0, j1)
        raise NotImplementedError(f"unsupported index {key!r}")
    if isinstance(key, (int, np.integer)):
        i = int(key) % m
        return _getrow_slice(a, i, i + 1)
    if isinstance(key, slice):
        start, stop, step = key.indices(m)
        if step != 1:
            raise NotImplementedError("strided row slicing")
        return _getrow_slice(a, start, max(stop, start))
    if isinstance(key, (list, np.ndarray, jnp.ndarray)):
        return _getrows_array(a, np.asarray(key))
    raise NotImplementedError(f"unsupported index {key!r}")
