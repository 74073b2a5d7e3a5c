"""CSC (compressed sparse column) matrix — immutable pytree container.

Re-provides the reference's `cupyx.scipy.sparse.csc_matrix`
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_csc.py).  Stored as
(indptr over columns, row indices, data).  Most compute ops route through CSR
(matching the reference policy where CSR@CSC converts the CSC operand,
`_csr.py:168-182`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import SparseMatrix, issparse

INDEX_DTYPE = prim.INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
class CSC(SparseMatrix):
    format = "csc"

    def __init__(self, arg1, shape: Optional[Tuple[int, int]] = None,
                 dtype=None, copy: bool = False, *, canonical: bool = False):
        if issparse(arg1):
            csc = arg1.tocsc()
            self.indptr, self.indices, self.data = (
                csc.indptr, csc.indices, csc.data)
            self._shape = csc.shape
            self._canonical = csc._canonical
        elif isinstance(arg1, tuple) and len(arg1) == 3:
            data, indices, indptr = arg1
            self.data = jnp.asarray(data, dtype=dtype)
            self.indices = jnp.asarray(indices, INDEX_DTYPE)
            self.indptr = jnp.asarray(indptr, INDEX_DTYPE)
            if not (self.data.ndim == self.indices.ndim
                    == self.indptr.ndim == 1):
                raise ValueError("data, indices and indptr must be 1-D")
            if self.data.shape[0] != self.indices.shape[0]:
                raise ValueError(
                    f"data length {self.data.shape[0]} != indices length "
                    f"{self.indices.shape[0]}")
            if self.indptr.shape[0] < 1:
                raise ValueError("indptr must have at least one element")
            if shape is None:
                n = self.indptr.shape[0] - 1
                m = int(jnp.max(self.indices)) + 1 if self.indices.shape[0] else 0
                shape = (m, n)
            self._shape = (int(shape[0]), int(shape[1]))
            if self.indptr.shape[0] != self._shape[1] + 1:
                raise ValueError(
                    f"indptr length {self.indptr.shape[0]} != cols+1 "
                    f"({self._shape[1] + 1})")
            self._canonical = canonical
        elif (
            isinstance(arg1, tuple)
            and len(arg1) == 2
            and isinstance(arg1[1], (tuple, list))
        ):
            from spmm_tpu.sparse.coo import COO

            csc = COO(arg1, shape=shape, dtype=dtype).tocsc()
            self.indptr, self.indices, self.data = (
                csc.indptr, csc.indices, csc.data)
            self._shape = csc.shape
            self._canonical = True
        elif hasattr(arg1, "ndim") and arg1.ndim == 2:
            from spmm_tpu.sparse.coo import COO

            csc = COO(jnp.asarray(arg1, dtype=dtype)).tocsc()
            self.indptr, self.indices, self.data = (
                csc.indptr, csc.indices, csc.data)
            self._shape = csc.shape
            self._canonical = True
        else:
            raise ValueError("unsupported CSC constructor argument")
        if dtype is not None:
            self.data = self.data.astype(dtype)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr), (
            self._shape, self._canonical)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.indices, obj.indptr = children
        obj._shape, obj._canonical = aux
        return obj

    @classmethod
    def from_parts(cls, indptr, indices, data, shape, *, canonical=False):
        obj = cls.__new__(cls)
        obj.indptr = jnp.asarray(indptr, INDEX_DTYPE)
        obj.indices = jnp.asarray(indices, INDEX_DTYPE)
        obj.data = jnp.asarray(data)
        obj._shape = (int(shape[0]), int(shape[1]))
        obj._canonical = canonical
        return obj

    def _with_data(self, data):
        return CSC.from_parts(self.indptr, self.indices, data, self._shape,
                              canonical=self._canonical)

    @property
    def has_canonical_format(self) -> bool:
        return self._canonical

    @property
    def cols(self):
        """Per-entry column ids."""
        return prim.rows_from_indptr(self.indptr, self.nnz)

    # -- conversions --------------------------------------------------------

    def tocsc(self) -> "CSC":
        return self

    def tocoo(self):
        from spmm_tpu.sparse.coo import COO

        return COO.from_parts(self.indices, self.cols, self.data,
                              self._shape, canonical=False)

    def tocsr(self):
        return self.tocoo().tocsr()

    def toarray(self, order=None, out=None):
        self._check_order(order, out)
        return prim.coo_to_dense(self.indices, self.cols, self.data,
                                 self._shape)

    def transpose(self):
        """CSC(m,n) viewed as CSR(n,m) — free transpose."""
        from spmm_tpu.sparse.csr import CSR

        return CSR.from_parts(self.indptr, self.indices, self.data,
                              (self._shape[1], self._shape[0]),
                              canonical=self._canonical)

    def sum_duplicates(self) -> "CSC":
        if self._canonical:
            return self
        return self.tocoo().tocsc()

    def sort_indices(self) -> "CSC":
        col = self.cols
        col_s, row_s, (data_s,) = prim.lexsort_rowcol(
            col, self.indices, (self.data,),
            (self._shape[1], self._shape[0]))
        return CSC.from_parts(self.indptr, row_s, data_s, self._shape,
                              canonical=self._canonical)
