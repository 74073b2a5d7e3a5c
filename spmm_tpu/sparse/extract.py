"""Nonzero extraction: find / tril / triu.

Re-provides the reference's `cupyx.scipy.sparse._extract` (/root/reference
modify_src/cupy-src/cupyx/scipy/sparse/_extract.py): COO-mask based, with
the same k-diagonal conventions as scipy.  These are eager (host-sized)
container operations — the kept-entry count is data-dependent, so each
does one count readback and a fixed-order compaction, like
`eliminate_zeros`.
"""

from __future__ import annotations

import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import issparse
from spmm_tpu.sparse.coo import COO

INDEX_DTYPE = prim.INDEX_DTYPE


def _as_coo(A) -> COO:
    if issparse(A):
        return A.tocoo()
    arr = jnp.asarray(A)
    if arr.ndim != 2:
        raise TypeError("A must be a 2-D array or a sparse matrix")
    return COO(arr)


def _masked_coo(coo: COO, mask) -> COO:
    """Keep masked entries in order (_extract.py:_masked_coo)."""
    nout = int(jnp.sum(mask))
    keep = prim.compact_positions(mask, nout)
    return COO.from_parts(coo.row[keep], coo.col[keep], coo.data[keep],
                          coo.shape, canonical=coo.has_canonical_format)


def find(A):
    """(rows, cols, values) of the nonzero entries of A, canonical order
    (_extract.py:9-29: coo → sum_duplicates → drop explicit zeros)."""
    coo = _as_coo(A).sum_duplicates()
    nz = _masked_coo(coo, coo.data != 0)
    return nz.row, nz.col, nz.data


def tril(A, k: int = 0, format=None):
    """Lower-triangular portion: entries with ``row + k >= col``
    (_extract.py:32-50)."""
    coo = _as_coo(A)
    out = _masked_coo(coo, coo.row + jnp.asarray(k, INDEX_DTYPE)
                      >= coo.col)
    return out.asformat(format or "coo")


def triu(A, k: int = 0, format=None):
    """Upper-triangular portion: entries with ``row + k <= col``
    (_extract.py:53-71)."""
    coo = _as_coo(A)
    out = _masked_coo(coo, coo.row + jnp.asarray(k, INDEX_DTYPE)
                      <= coo.col)
    return out.asformat(format or "coo")
