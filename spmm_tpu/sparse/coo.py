"""COO (coordinate) sparse matrix — immutable pytree container.

Re-provides the capability of the reference's `cupyx.scipy.sparse.coo_matrix`
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_coo.py): (row, col,
data) triplets, canonicalisation by stable (row, col) lexsort + duplicate
summation (`_coo.py:356-459` does lexsort + atomicAdd scatter; here it is a
stable sort + fixed-order segment sum — deterministic with no atomics), and
conversion to CSR/CSC mirroring `_coo.py:517-539` (sum_duplicates → sort →
indptr build).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import SparseMatrix, issparse

INDEX_DTYPE = prim.INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
class COO(SparseMatrix):
    format = "coo"

    def __init__(self, arg1, shape: Optional[Tuple[int, int]] = None,
                 dtype=None, copy: bool = False, *, canonical: bool = False):
        if issparse(arg1):
            coo = arg1.tocoo()
            self.row, self.col, self.data = coo.row, coo.col, coo.data
            self._shape = coo.shape
            self._canonical = coo._canonical
        elif (
            isinstance(arg1, tuple)
            and len(arg1) == 2
            and isinstance(arg1[1], (tuple, list))
            and len(arg1[1]) == 2
        ):
            # (data, (row, col)) triplet form
            data, (row, col) = arg1
            self.data = jnp.asarray(data, dtype=dtype)
            self.row = jnp.asarray(row, dtype=INDEX_DTYPE)
            self.col = jnp.asarray(col, dtype=INDEX_DTYPE)
            if shape is None:
                m = int(jnp.max(self.row)) + 1 if self.row.shape[0] else 0
                n = int(jnp.max(self.col)) + 1 if self.col.shape[0] else 0
                shape = (m, n)
            self._shape = (int(shape[0]), int(shape[1]))
            self._canonical = canonical
        elif hasattr(arg1, "ndim") and arg1.ndim == 2:
            dense = jnp.asarray(arg1, dtype=dtype)
            from spmm_tpu.sparse import convert

            coo = convert.dense_to_coo(dense)
            self.row, self.col, self.data = coo.row, coo.col, coo.data
            self._shape = coo.shape
            self._canonical = True
        else:
            raise ValueError("unsupported COO constructor argument")
        if dtype is not None:
            self.data = self.data.astype(dtype)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.data, self.row, self.col), (self._shape, self._canonical)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.row, obj.col = children
        obj._shape, obj._canonical = aux
        return obj

    @classmethod
    def from_parts(cls, row, col, data, shape, *, canonical=False):
        obj = cls.__new__(cls)
        obj.row = jnp.asarray(row, INDEX_DTYPE)
        obj.col = jnp.asarray(col, INDEX_DTYPE)
        obj.data = jnp.asarray(data)
        obj._shape = (int(shape[0]), int(shape[1]))
        obj._canonical = canonical
        return obj

    def _with_data(self, data):
        return COO.from_parts(self.row, self.col, data, self._shape,
                              canonical=self._canonical)

    # -- canonicalisation ---------------------------------------------------

    @property
    def has_canonical_format(self) -> bool:
        return self._canonical

    def sum_duplicates(self) -> "COO":
        """Return a canonical COO: lex-sorted by (row, col), duplicates summed.

        Mirrors `_coo.py:356-459` semantics (stable lexsort then accumulate);
        the accumulate here is a fixed-order segment sum, so results are
        bitwise-stable across runs.
        """
        if self._canonical or self.nnz == 0:
            if not self._canonical:
                return COO.from_parts(self.row, self.col, self.data,
                                      self._shape, canonical=True)
            return self
        row_s, col_s, (data_s,) = prim.lexsort_rowcol(
            self.row, self.col, (self.data,), self._shape
        )
        nout = int(prim.count_unique_sorted(row_s, col_s))
        if nout == self.nnz:
            return COO.from_parts(row_s, col_s, data_s, self._shape,
                                  canonical=True)
        r, c, d = prim.sum_duplicates_sorted(row_s, col_s, data_s, nout)
        return COO.from_parts(r, c, d, self._shape, canonical=True)

    def eliminate_zeros(self) -> "COO":
        mask = self.data != 0
        nout = int(jnp.sum(mask))
        keep = prim.compact_positions(mask, nout)
        return COO.from_parts(self.row[keep], self.col[keep],
                              self.data[keep], self._shape,
                              canonical=self._canonical)

    # -- conversions --------------------------------------------------------

    def tocoo(self) -> "COO":
        return self

    def tocsr(self):
        from spmm_tpu.sparse.csr import CSR

        coo = self.sum_duplicates()
        indptr = prim.build_indptr(coo.row, self._shape[0])
        return CSR.from_parts(indptr, coo.col, coo.data, self._shape,
                              canonical=True)

    def tocsc(self):
        from spmm_tpu.sparse.csc import CSC

        coo = self.sum_duplicates()
        # column-major ordering: lexsort by (col, row)
        col_s, row_s, (data_s,) = prim.lexsort_rowcol(
            coo.col, coo.row, (coo.data,), (self._shape[1], self._shape[0])
        )
        indptr = prim.build_indptr(col_s, self._shape[1])
        return CSC.from_parts(indptr, row_s, data_s, self._shape,
                              canonical=True)

    def toarray(self, order=None, out=None):
        self._check_order(order, out)
        return prim.coo_to_dense(self.row, self.col, self.data, self._shape)

    def transpose(self) -> "COO":
        return COO.from_parts(self.col, self.row, self.data,
                              (self._shape[1], self._shape[0]),
                              canonical=False)

    def reshape(self, *shape):
        raise NotImplementedError("reshape of sparse matrices is unsupported")

    def __repr__(self):
        m, n = self.shape
        return (
            f"<{m}x{n} sparse matrix of type {self.dtype} with {self.nnz} "
            f"stored elements in COOrdinate format>"
        )
