"""CSR indexing: element access, slicing, row/column selection, masks.

Re-provides the reference's fancy-indexing layer (/root/reference
modify_src/cupy-src/cupyx/scipy/sparse/_index.py, 707 LoC): `A[i]`,
`A[i:j]`, `A[i:j:s]`, `A[i, j]`, `A[:, j0:j1]`, `A[:, cols]`,
`A[rows_array]`, `A[bool_mask]`, `A[rows, cols]` pair extraction, and
scalar `A[i, j] = v` assignment.  Built on the same host-sizing +
static-kernel pattern as the rest of the framework; selection-heavy forms
run on the host (they are metadata operations, not compute).
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


def _getcols_array(a, cols):
    """A[:, cols] for an integer array (duplicates allowed, any order) —
    the column counterpart of `_getrows_array` (reference
    `_index.py` major/minor index paths).  Host metadata op."""
    from spmm_tpu.sparse.coo import COO

    a = a.sum_duplicates()
    cols = np.asarray(cols, np.int64)
    ix = np.asarray(a.indices)
    dv = np.asarray(a.data)
    rows_h = np.asarray(a.rows)
    out_rows, out_cols, out_vals = [], [], []
    for j, c in enumerate(cols):
        sel = ix == c
        out_rows.append(rows_h[sel])
        out_cols.append(np.full(int(sel.sum()), j, np.int64))
        out_vals.append(dv[sel])
    if out_rows:
        out_rows = np.concatenate(out_rows)
        out_cols = np.concatenate(out_cols)
        out_vals = np.concatenate(out_vals)
    else:
        out_rows = np.zeros(0, np.int64)
        out_cols = np.zeros(0, np.int64)
        out_vals = np.zeros(0, dv.dtype)
    return COO((out_vals, (out_rows, out_cols)),
               shape=(a.shape[0], len(cols))).tocsr()


def _get_pairs(a, rows, cols):
    """A[rows, cols] pair extraction → dense (1, N) row vector (SciPy's
    matrix semantics for paired fancy indexing)."""
    rows = np.asarray(rows, np.int64).ravel()
    cols = np.asarray(cols, np.int64).ravel()
    if rows.shape != cols.shape:
        raise IndexError("row and column index arrays must match in length")
    ip = np.asarray(a.indptr)
    ix = np.asarray(a.indices)
    dv = np.asarray(a.data)
    out = np.zeros(rows.shape[0], dv.dtype)
    for t, (r, c) in enumerate(zip(rows, cols)):
        seg = slice(int(ip[r]), int(ip[r + 1]))
        hit = ix[seg] == c
        if hit.any():
            out[t] = dv[seg][hit].sum()
    return jnp.asarray(out)[None, :]


def _is_bool_array(x) -> bool:
    x = np.asarray(x)
    return x.dtype == np.bool_


def _normalize_rows_key(a, key):
    """int / slice / int array / bool mask → explicit row index array, or
    None when the key selects all rows contiguously."""
    m = a.shape[0]
    if isinstance(key, slice):
        start, stop, step = key.indices(m)
        if step == 1:
            return None, (start, stop)
        return np.arange(start, stop, step, dtype=np.int64), None
    arr = np.asarray(key)
    if arr.dtype == np.bool_:
        if arr.shape[0] != m:
            raise IndexError(f"boolean row mask length {arr.shape[0]} != "
                             f"rows {m}")
        return np.nonzero(arr)[0], None
    return arr.astype(np.int64) % m, None


def csr_getitem(a, key):
    m, n = a.shape
    if isinstance(key, tuple) and len(key) == 2:
        ik, jk = key
        int_i = isinstance(ik, (int, np.integer))
        int_j = isinstance(jk, (int, np.integer))
        if int_i and int_j:
            return _getitem_element(a, int(ik) % m, int(jk) % n)
        arr_i = isinstance(ik, (list, np.ndarray, jnp.ndarray))
        arr_j = isinstance(jk, (list, np.ndarray, jnp.ndarray))
        if arr_i and arr_j:
            ri = np.asarray(ik)
            cj = np.asarray(jk)
            if ri.dtype == np.bool_:
                ri = np.nonzero(ri)[0]
            if cj.dtype == np.bool_:
                cj = np.nonzero(cj)[0]
            return _get_pairs(a, ri % m, cj % n)
        if isinstance(ik, slice) and ik == slice(None):
            if isinstance(jk, slice):
                j0, j1, step = jk.indices(n)
                if step == 1:
                    return _getcols_slice(a, j0, j1)
                return _getcols_array(a, np.arange(j0, j1, step))
            if int_j:
                return _getcols_slice(a, int(jk) % n, int(jk) % n + 1)
            if arr_j:
                cj = np.asarray(jk)
                if cj.dtype == np.bool_:
                    cj = np.nonzero(cj)[0]
                return _getcols_array(a, cj % n)
        if int_i and isinstance(jk, slice):
            row = _getrow_slice(a, int(ik) % m, int(ik) % m + 1)
            j0, j1, step = jk.indices(n)
            if step == 1:
                return _getcols_slice(row, j0, j1)
            return _getcols_array(row, np.arange(j0, j1, step))
        if (arr_i or isinstance(ik, slice)) and isinstance(jk, slice) \
                and jk == slice(None):
            return csr_getitem(a, ik)
        raise NotImplementedError(f"unsupported index {key!r}")
    if isinstance(key, (int, np.integer)):
        i = int(key) % m
        return _getrow_slice(a, i, i + 1)
    if isinstance(key, slice):
        rows, contig = _normalize_rows_key(a, key)
        if contig is not None:
            start, stop = contig
            return _getrow_slice(a, start, max(stop, start))
        return _getrows_array(a, rows)
    if isinstance(key, (list, np.ndarray, jnp.ndarray)):
        rows, _ = _normalize_rows_key(a, key)
        return _getrows_array(a, rows)
    raise NotImplementedError(f"unsupported index {key!r}")


def csr_setitem(a, key, value):
    """Scalar element assignment `A[i, j] = v` (in place, like the
    reference's `_index.py` __setitem__ — the container's arrays are
    rebuilt and swapped).  Other assignment forms raise."""
    if not (isinstance(key, tuple) and len(key) == 2
            and isinstance(key[0], (int, np.integer))
            and isinstance(key[1], (int, np.integer))):
        raise NotImplementedError(
            "only scalar element assignment A[i, j] = v is supported")
    m, n = a.shape
    i = int(key[0]) % m
    j = int(key[1]) % n
    a2 = a.sum_duplicates()
    ip = np.asarray(a2.indptr)
    ix = np.asarray(a2.indices)
    dv = np.asarray(a2.data)
    s, e = int(ip[i]), int(ip[i + 1])
    hit = np.nonzero(ix[s:e] == j)[0]
    if hit.size:
        dv = dv.copy()
        dv[s + hit[0]] = value
    else:
        insert = s + int(np.searchsorted(ix[s:e], j))
        ix = np.insert(ix, insert, j)
        dv = np.insert(dv, insert, np.asarray(value, dv.dtype))
        ip = ip.copy()
        ip[i + 1:] += 1
    a.indptr = jnp.asarray(ip, INDEX_DTYPE)
    a.indices = jnp.asarray(ix, INDEX_DTYPE)
    a.data = jnp.asarray(dv)
    a._canonical = True
    return a
