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
    `_index.py` major/minor index paths).  Host metadata op, one sort
    pass: each entry expands to its matches among the requested columns
    via two searchsorteds into the sorted request (no per-column scan)."""
    from spmm_tpu.sparse.coo import COO

    a = a.sum_duplicates()
    cols = np.asarray(cols, np.int64)
    ix = np.asarray(a.indices, np.int64)
    dv = np.asarray(a.data)
    rows_h = np.asarray(a.rows, np.int64)
    order = np.argsort(cols, kind="stable")
    sc = cols[order]
    lo = np.searchsorted(sc, ix, side="left")
    hi = np.searchsorted(sc, ix, side="right")
    cnt = hi - lo                      # matches per entry (dup cols ok)
    src = np.repeat(np.arange(ix.shape[0]), cnt)
    total = int(cnt.sum())
    ofs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
    out_cols = order[lo[src] + ofs]    # output column = request position
    return COO((dv[src], (rows_h[src], out_cols)),
               shape=(a.shape[0], len(cols))).tocsr()


def _lookup_pairs(a, rows, cols):
    """Value lookup for flat (row, col) position arrays against the
    canonical entry keys.  Returns (values, hit_mask) — one searchsorted
    over row*n+col keys, no per-pair host loop."""
    a = a.sum_duplicates()
    ix = np.asarray(a.indices, np.int64)
    dv = np.asarray(a.data)
    n = a.shape[1]
    ekeys = np.asarray(a.rows, np.int64) * n + ix  # ascending (canonical)
    pkeys = np.asarray(rows, np.int64) * n + np.asarray(cols, np.int64)
    pos = np.searchsorted(ekeys, pkeys)
    posc = np.minimum(pos, max(ekeys.shape[0] - 1, 0))
    hit = (ekeys.shape[0] > 0) & (ekeys[posc] == pkeys)
    vals = np.where(hit, dv[posc], 0).astype(dv.dtype)
    return vals, hit


def _get_mesh(a, ri, cj):
    """2-D fancy mesh `A[ri, cj]` with broadcastable index arrays (e.g.
    `A[np.ix_(rows, cols)]` / `A[rows[:, None], cols]`) → sparse submatrix
    of the broadcast shape (reference `_index.py` _major_index_fancy +
    _minor_index_fancy composition; SciPy mesh semantics).  Stored-entry
    pattern is preserved (explicit zeros survive); positions absent from
    A are absent from the result."""
    from spmm_tpu.sparse.coo import COO

    ri, cj = np.broadcast_arrays(np.asarray(ri, np.int64),
                                 np.asarray(cj, np.int64))
    shape = ri.shape
    vals, hit = _lookup_pairs(a, ri.ravel(), cj.ravel())
    out_i, out_j = np.unravel_index(np.nonzero(hit)[0], shape)
    return COO((vals[hit], (out_i, out_j)), shape=shape).tocsr()


def _get_pairs(a, rows, cols):
    """A[rows, cols] pair extraction → dense (1, N) row vector (SciPy's
    matrix semantics for paired fancy indexing).  One searchsorted over
    the canonical (row, col) keys — no per-pair host loop."""
    rows = np.asarray(rows, np.int64).ravel()
    cols = np.asarray(cols, np.int64).ravel()
    if rows.shape != cols.shape:
        raise IndexError("row and column index arrays must match in length")
    out, _ = _lookup_pairs(a, rows, cols)
    return jnp.asarray(out)[None, :]


def _is_bool_array(x) -> bool:
    x = np.asarray(x)
    return x.dtype == np.bool_


def _check_int(i, extent: int, what: str) -> int:
    """Bounds-checked scalar index → non-negative index.  SciPy raises
    IndexError out of range (also what terminates `for row in A`
    iteration via the legacy sequence protocol)."""
    i = int(i)
    if not -extent <= i < extent:
        raise IndexError(f"{what} index {i} out of range (extent {extent})")
    return i % extent


def _check_arr(arr, extent: int, what: str):
    """Bounds-checked integer index array → non-negative indices."""
    arr = np.asarray(arr)
    if arr.size and (arr.min() < -extent or arr.max() >= extent):
        raise IndexError(f"{what} index out of range (extent {extent})")
    return arr.astype(np.int64) % extent


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
    return _check_arr(arr, m, 'row'), None


def csr_getitem(a, key):
    m, n = a.shape
    if isinstance(key, tuple) and len(key) == 2:
        ik, jk = key
        int_i = isinstance(ik, (int, np.integer))
        int_j = isinstance(jk, (int, np.integer))
        if int_i and int_j:
            return _getitem_element(a, _check_int(ik, m, 'row'),
                                    _check_int(jk, n, 'column'))
        arr_i = isinstance(ik, (list, np.ndarray, jnp.ndarray))
        arr_j = isinstance(jk, (list, np.ndarray, jnp.ndarray))
        if (arr_i or int_i) and (arr_j or int_j):
            # array-valued on both axes: SciPy broadcast-pair semantics
            # (1-D → (1, N) pair vector) or 2-D fancy mesh (np.ix_ /
            # rows[:, None]-style → sparse submatrix of the broadcast
            # shape).  Reference `_index.py:294-324` __getitem__ array x
            # array dispatch.
            ri = np.asarray(ik)
            cj = np.asarray(jk)
            if ri.dtype == np.bool_:
                ri = np.nonzero(ri)[0]
            if cj.dtype == np.bool_:
                cj = np.nonzero(cj)[0]
            ri = _check_arr(ri, m, 'row')
            cj = _check_arr(cj, n, 'column')
            if ri.ndim > 1 or cj.ndim > 1:
                return _get_mesh(a, ri, cj)
            return _get_pairs(a, *np.broadcast_arrays(ri, cj))
        if isinstance(ik, slice) and ik == slice(None):
            if isinstance(jk, slice):
                j0, j1, step = jk.indices(n)
                if step == 1:
                    return _getcols_slice(a, j0, j1)
                return _getcols_array(a, np.arange(j0, j1, step))
            if int_j:
                j = _check_int(jk, n, 'column')
                return _getcols_slice(a, j, j + 1)
            if arr_j:
                cj = np.asarray(jk)
                if cj.dtype == np.bool_:
                    cj = np.nonzero(cj)[0]
                return _getcols_array(a, _check_arr(cj, n, 'column'))
        if int_i and isinstance(jk, slice):
            i = _check_int(ik, m, 'row')
            row = _getrow_slice(a, i, i + 1)
            j0, j1, step = jk.indices(n)
            if step == 1:
                return _getcols_slice(row, j0, j1)
            return _getcols_array(row, np.arange(j0, j1, step))
        if (arr_i or isinstance(ik, slice)) and isinstance(jk, slice) \
                and jk == slice(None):
            return csr_getitem(a, ik)
        if (arr_i or isinstance(ik, slice)) and (
                arr_j or int_j or isinstance(jk, slice)):
            # general outer indexing (row-key x col-key): select rows,
            # then columns on the row submatrix
            sub = csr_getitem(a, ik)
            return csr_getitem(sub, (slice(None), jk))
        raise NotImplementedError(f"unsupported index {key!r}")
    if isinstance(key, (int, np.integer)):
        i = _check_int(key, m, 'row')
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


def _assign_entries(a, new_rows, new_cols, new_vals, clear_rows=None,
                    clear_cols=None):
    """Core assignment merge (host metadata op, one sort pass).

    SciPy/reference semantics (`_index.py:400,555-561` `_set_many` /
    `_set_arrayXarray_sparse`): assigned positions take the new value —
    explicit zeros are STORED, not pruned; for block assignment
    (`clear_rows`, optionally restricted to `clear_cols` for submatrix
    assignment) every pre-existing entry in the cleared region is set
    to explicit 0 first, so the result pattern is the union.  Duplicate
    assigned positions: last one wins."""
    a2 = a.sum_duplicates()
    m, n = a2.shape
    ix = np.asarray(a2.indices, np.int64)
    dv = np.asarray(a2.data).copy()
    erows = np.asarray(a2.rows, np.int64)
    if clear_rows is not None and erows.size:
        cleared = np.isin(erows, np.asarray(clear_rows, np.int64))
        if clear_cols is not None:
            cleared &= np.isin(ix, np.asarray(clear_cols, np.int64))
        dv[cleared] = 0
    ekeys = erows * n + ix
    nkeys = np.asarray(new_rows, np.int64) * n \
        + np.asarray(new_cols, np.int64)
    nvals = np.asarray(new_vals, dv.dtype).ravel()
    all_keys = np.concatenate([ekeys, nkeys])
    all_vals = np.concatenate([dv, nvals])
    order = np.argsort(all_keys, kind="stable")
    ks = all_keys[order]
    last = np.concatenate([ks[1:] != ks[:-1], [True]]) \
        if ks.size else np.zeros(0, bool)
    sel = order[last]
    out_keys = ks[last]
    out_vals = all_vals[sel]
    out_rows = out_keys // n
    indptr = np.concatenate(
        [[0], np.cumsum(np.bincount(out_rows, minlength=m))])
    a.indptr = jnp.asarray(indptr, INDEX_DTYPE)
    a.indices = jnp.asarray(out_keys % n, INDEX_DTYPE)
    a.data = jnp.asarray(out_vals)
    a._canonical = True
    return a


def _set_rows(a, rows_sel, value):
    """Row-block assignment `A[rows] = B` with B sparse (explicit entries
    overlay, old entries zeroed in place) or dense (every position of the
    assigned rows stored, matching SciPy)."""
    from spmm_tpu.sparse.base import issparse

    m, n = a.shape
    rows_sel = np.asarray(rows_sel, np.int64)
    if issparse(value):
        if value.shape != (rows_sel.shape[0], n):
            raise ValueError(
                f"shape mismatch: assigning {value.shape} into "
                f"{(rows_sel.shape[0], n)} rows")
        b = value.tocsr().sum_duplicates()
        brows = np.asarray(b.rows, np.int64)
        return _assign_entries(a, rows_sel[brows],
                               np.asarray(b.indices, np.int64),
                               np.asarray(b.data), clear_rows=rows_sel)
    vals = np.asarray(value)
    vals = np.broadcast_to(vals, (rows_sel.shape[0], n))
    nr = np.repeat(rows_sel, n)
    nc = np.tile(np.arange(n, dtype=np.int64), rows_sel.shape[0])
    return _assign_entries(a, nr, nc, vals.ravel(), clear_rows=rows_sel)


def _set_submatrix(a, rows_sel, cols_sel, value):
    """Submatrix assignment `A[rows, cols_sel] = B` over an outer
    rows x cols selection, with B sparse (reference `_index.py:555-561`
    `_set_arrayXarray_sparse`: old entries in the selected region zeroed
    in place, B's pattern overlaid) or dense/scalar (every position of
    the selection stored, `_set_many`)."""
    from spmm_tpu.sparse.base import issparse

    rows_sel = np.asarray(rows_sel, np.int64)
    cols_sel = np.asarray(cols_sel, np.int64)
    R, C = rows_sel.shape[0], cols_sel.shape[0]
    if issparse(value):
        if value.shape != (R, C):
            raise ValueError(
                f"shape mismatch: assigning {value.shape} into {(R, C)}")
        b = value.tocsr().sum_duplicates()
        brows = np.asarray(b.rows, np.int64)
        bcols = np.asarray(b.indices, np.int64)
        return _assign_entries(a, rows_sel[brows], cols_sel[bcols],
                               np.asarray(b.data), clear_rows=rows_sel,
                               clear_cols=cols_sel)
    vals = np.broadcast_to(np.asarray(value), (R, C))
    nr = np.repeat(rows_sel, C)
    nc = np.tile(cols_sel, R)
    return _assign_entries(a, nr, nc, vals.ravel())


def _normalize_axis_key(key, extent):
    """slice / int / int array / bool mask → explicit index array."""
    if isinstance(key, slice):
        start, stop, step = key.indices(extent)
        return np.arange(start, stop, step, dtype=np.int64)
    if isinstance(key, (int, np.integer)):
        return np.asarray([_check_int(key, extent, 'axis')], np.int64)
    arr = np.asarray(key)
    if arr.dtype == np.bool_:
        if arr.shape[0] != extent:
            raise IndexError(
                f"boolean mask length {arr.shape[0]} != extent {extent}")
        return np.nonzero(arr)[0]
    return _check_arr(arr, extent, 'axis').ravel()


def csr_setitem(a, key, value):
    """Assignment (in place — the container's arrays are rebuilt and
    swapped, like the reference's `_index.py` __setitem__):

      * `A[i, j] = v` — scalar element
      * `A[rows, cols] = v | vals` — paired fancy assignment
        (`_index.py:400` _set_many; explicit zeros stored, last dup wins)
      * `A[i] = B`, `A[rows] = B`, `A[i:j] = B` — row-block assignment
        with B sparse or dense (`_index.py:555-561`
        _set_arrayXarray_sparse: old entries zeroed explicitly, new
        pattern overlaid)
    """
    from spmm_tpu.sparse.base import issparse

    m, n = a.shape
    if isinstance(key, tuple) and len(key) == 2:
        ik, jk = key
        int_i = isinstance(ik, (int, np.integer))
        int_j = isinstance(jk, (int, np.integer))
        if int_i and int_j:
            return _assign_entries(
                a, np.asarray([_check_int(ik, m, 'row')]),
                np.asarray([_check_int(jk, n, 'column')]),
                np.asarray([value], np.asarray(a.data).dtype))
        arr_i = isinstance(ik, (list, np.ndarray, jnp.ndarray))
        arr_j = isinstance(jk, (list, np.ndarray, jnp.ndarray))
        if (arr_i or int_i) and (arr_j or int_j):
            ri = np.asarray(ik)
            cj = np.asarray(jk)
            if ri.dtype == np.bool_:
                ri = np.nonzero(ri)[0]
            if cj.dtype == np.bool_:
                cj = np.nonzero(cj)[0]
            ri = ri.astype(np.int64)
            cj = cj.astype(np.int64)
            if ri.ndim > 1 or cj.ndim > 1:
                # 2-D fancy mesh assignment (np.ix_ / rows[:, None] form)
                ri2, cj2 = np.broadcast_arrays(_check_arr(ri, m, 'row'),
                                               _check_arr(cj, n, 'column'))
                if issparse(value):
                    rows_sel = ri2[:, 0]
                    cols_sel = cj2[0, :]
                    outer = (np.array_equal(
                        ri2, np.broadcast_to(rows_sel[:, None], ri2.shape))
                        and np.array_equal(
                            cj2, np.broadcast_to(cols_sel, cj2.shape)))
                    if outer:
                        return _set_submatrix(a, rows_sel, cols_sel, value)
                    value = np.asarray(value.toarray())
                vals = np.broadcast_to(
                    np.asarray(value, np.asarray(a.data).dtype), ri2.shape)
                return _assign_entries(a, ri2.ravel(), cj2.ravel(),
                                       vals.ravel())
            ri = _check_arr(ri, m, 'row').ravel()
            cj = _check_arr(cj, n, 'column').ravel()
            ri, cj = np.broadcast_arrays(ri, cj)
            vals = np.broadcast_to(
                np.asarray(value, np.asarray(a.data).dtype).ravel()
                if np.ndim(value) else np.asarray(value), ri.shape)
            return _assign_entries(a, ri, cj, vals)
        if isinstance(jk, slice) and jk == slice(None):
            key = ik  # fall through to the row forms below
        elif (arr_i or int_i or isinstance(ik, slice)) and (
                arr_j or int_j or isinstance(jk, slice)):
            # submatrix assignment over an outer rows x cols selection:
            # A[i0:i1, j0:j1] = B, A[rows, j0:j1:s] = B, A[i, cols] = B, ...
            rows_sel = _normalize_axis_key(ik, m)
            cols_sel = _normalize_axis_key(jk, n)
            return _set_submatrix(a, rows_sel, cols_sel, value)
        else:
            raise NotImplementedError(f"unsupported assignment key "
                                      f"{key!r}")
    if isinstance(key, (int, np.integer)):
        rows_sel = np.asarray([_check_int(key, m, 'row')], np.int64)
        if not issparse(value):
            value = np.asarray(value).reshape(1, -1) \
                if np.ndim(value) else value
        return _set_rows(a, rows_sel, value)
    if isinstance(key, slice):
        start, stop, step = key.indices(m)
        return _set_rows(a, np.arange(start, stop, step, dtype=np.int64),
                         value)
    if isinstance(key, (list, np.ndarray, jnp.ndarray)):
        rows, _ = _normalize_rows_key(a, key)
        return _set_rows(a, rows, value)
    raise NotImplementedError(f"unsupported assignment key {key!r}")
