"""CSR (compressed sparse row) matrix — immutable pytree container.

Re-provides the reference's `cupyx.scipy.sparse.csr_matrix`
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_csr.py):
(indptr, indices, data) storage, the `@` dispatch policy of
`_csr.py:151-226` (scalar→scale, CSR@CSR→spgemm, CSR@CSC→convert→spgemm,
CSR@vec→spmv, CSR@dense→spmm), `sort_indices` (`_csr.py:370-381`, there via
cusparse.csrsort — here a stable lexsort), and `toarray` (`_csr.py:383-425`).

TPU-first notes: the container is an immutable pytree with static shape
metadata, so it traces straight through `jit` / `shard_map`; row ids are
recovered from indptr with a scatter-marks+cumsum expansion
(`_primitives.rows_from_indptr`) rather than a CUDA kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import SparseMatrix, issparse

INDEX_DTYPE = prim.INDEX_DTYPE


@jax.tree_util.register_pytree_node_class
class CSR(SparseMatrix):
    format = "csr"

    def __init__(self, arg1, shape: Optional[Tuple[int, int]] = None,
                 dtype=None, copy: bool = False, *, canonical: bool = False):
        if issparse(arg1):
            csr = arg1.tocsr()
            self.indptr, self.indices, self.data = (
                csr.indptr, csr.indices, csr.data)
            self._shape = csr.shape
            self._canonical = csr._canonical
        elif isinstance(arg1, tuple) and len(arg1) == 3:
            data, indices, indptr = arg1
            self.data = jnp.asarray(data, dtype=dtype)
            self.indices = jnp.asarray(indices, INDEX_DTYPE)
            self.indptr = jnp.asarray(indptr, INDEX_DTYPE)
            # component validation (reference `_compressed.py` check_format
            # / test_csr.py TestCsrMatrixInvalidInit behaviors)
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
                m = self.indptr.shape[0] - 1
                n = int(jnp.max(self.indices)) + 1 if self.indices.shape[0] else 0
                shape = (m, n)
            self._shape = (int(shape[0]), int(shape[1]))
            if self.indptr.shape[0] != self._shape[0] + 1:
                raise ValueError(
                    f"indptr length {self.indptr.shape[0]} != rows+1 "
                    f"({self._shape[0] + 1})")
            self._canonical = canonical
        elif (
            isinstance(arg1, tuple)
            and len(arg1) == 2
            and isinstance(arg1[1], (tuple, list))
        ):
            from spmm_tpu.sparse.coo import COO

            csr = COO(arg1, shape=shape, dtype=dtype).tocsr()
            self.indptr, self.indices, self.data = (
                csr.indptr, csr.indices, csr.data)
            self._shape = csr.shape
            self._canonical = True
        elif isinstance(arg1, tuple) and len(arg1) == 2 and shape is None:
            # empty matrix of given shape: CSR((m, n))
            m, n = int(arg1[0]), int(arg1[1])
            self.data = jnp.zeros((0,), dtype or jnp.float32)
            self.indices = jnp.zeros((0,), INDEX_DTYPE)
            self.indptr = jnp.zeros((m + 1,), INDEX_DTYPE)
            self._shape = (m, n)
            self._canonical = True
        elif hasattr(arg1, "ndim") and arg1.ndim == 2:
            from spmm_tpu.sparse.coo import COO

            csr = COO(jnp.asarray(arg1, dtype=dtype)).tocsr()
            self.indptr, self.indices, self.data = (
                csr.indptr, csr.indices, csr.data)
            self._shape = csr.shape
            self._canonical = True
        else:
            raise ValueError("unsupported CSR constructor argument")
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

    @classmethod
    def from_scipy(cls, mat):
        mat = mat.tocsr()
        return cls.from_parts(mat.indptr, mat.indices, mat.data,
                              mat.shape, canonical=bool(mat.has_canonical_format))

    def _with_data(self, data):
        return CSR.from_parts(self.indptr, self.indices, data, self._shape,
                              canonical=self._canonical)

    # -- canonicalisation ---------------------------------------------------

    @property
    def has_canonical_format(self) -> bool:
        return self._canonical

    @property
    def rows(self):
        """Per-entry row ids (csr2coo direction)."""
        return prim.rows_from_indptr(self.indptr, self.nnz)

    def check_canonical(self) -> bool:
        """Device check that indices are per-row sorted and duplicate-free.

        The TPU analogue of the reference's ElementwiseKernel check
        (_compressed.py:859-898).
        """
        return bool(prim.is_sorted_canonical(self.rows, self.indices))

    def sort_indices(self) -> "CSR":
        """Return a CSR with per-row column indices sorted (csrsort analogue)."""
        row = self.rows
        row_s, col_s, (data_s,) = prim.lexsort_rowcol(
            row, self.indices, (self.data,), self._shape)
        return CSR.from_parts(self.indptr, col_s, data_s, self._shape,
                              canonical=self._canonical)

    def sorted_indices(self) -> "CSR":
        return self.sort_indices()

    def sum_duplicates(self) -> "CSR":
        """Canonicalise: sorted indices and no duplicates.

        The reference round-trips through COO (_compressed.py:971-991);
        here the same composition is a sort + fixed-order segment-sum.
        """
        if self._canonical:
            return self
        return self.tocoo().tocsr()

    def eliminate_zeros(self) -> "CSR":
        return self.tocoo().eliminate_zeros().tocsr()

    # -- conversions --------------------------------------------------------

    def tocsr(self) -> "CSR":
        return self

    def tocoo(self):
        from spmm_tpu.sparse.coo import COO

        return COO.from_parts(self.rows, self.indices, self.data,
                              self._shape, canonical=self._canonical)

    def tocsc(self):
        from spmm_tpu.sparse.csc import CSC

        a = self.sum_duplicates()
        col_s, row_s, (data_s,) = prim.lexsort_rowcol(
            a.indices, a.rows, (a.data,),
            (self._shape[1], self._shape[0]))
        indptr = prim.build_indptr(col_s, self._shape[1])
        return CSC.from_parts(indptr, row_s, data_s, self._shape,
                              canonical=True)

    def toarray(self, order=None, out=None):
        self._check_order(order, out)
        if self._canonical:
            return prim.csr_to_dense_canonical(
                self.indptr, self.indices, self.data, self._shape)
        return prim.coo_to_dense(self.rows, self.indices, self.data,
                                 self._shape)

    def transpose(self):
        """CSR transpose = CSC with swapped shape reinterpreted (cheap),
        materialised back to CSR (mirrors `_csr.py:525-532`)."""
        return self.tocoo().transpose().tocsr()

    def getrow(self, i: int) -> "CSR":
        start = int(self.indptr[i])
        end = int(self.indptr[i + 1])
        indptr = jnp.array([0, end - start], INDEX_DTYPE)
        return CSR.from_parts(indptr, self.indices[start:end],
                              self.data[start:end], (1, self._shape[1]),
                              canonical=self._canonical)

    def __getitem__(self, key):
        from spmm_tpu.sparse import indexing

        return indexing.csr_getitem(self, key)

    def __setitem__(self, key, value):
        from spmm_tpu.sparse import indexing

        indexing.csr_setitem(self, key, value)

    def getcol(self, j: int) -> "CSR":
        """Column j as an (m, 1) CSR (reference test_csr.py `test_getcol`
        semantics)."""
        return self[:, int(j) % self._shape[1]]

    def setdiag(self, values, k: int = 0):
        """Write `values` along diagonal k in place (scipy/reference
        `setdiag` semantics: scalar broadcasts over the whole diagonal;
        an array shorter than the diagonal writes only its length; longer
        is truncated; k <= -m or k >= n raises ValueError).  Explicit
        zeros are stored, like assignment."""
        import numpy as _np

        m, n = self._shape
        if k <= -m or k >= n:
            raise ValueError(f"k ({k}) exceeds matrix dimensions")
        from spmm_tpu.sparse import indexing

        m_st, n_st = max(0, -k), max(0, k)
        dlen = min(m - m_st, n - n_st)
        vals = _np.asarray(values)
        if vals.ndim == 0:
            L = dlen
            vals = _np.broadcast_to(vals, (L,))
        else:
            L = min(dlen, vals.shape[0])
            vals = vals[:L]
        rows = m_st + _np.arange(L, dtype=_np.int64)
        cols = n_st + _np.arange(L, dtype=_np.int64)
        indexing._assign_entries(self, rows, cols,
                                 vals.astype(_np.asarray(self.data).dtype))

    def diagonal(self, k: int = 0):
        coo = self.tocoo()
        m, n = self._shape
        size = max(0, min(m + min(k, 0), n - max(k, 0)))
        out = jnp.zeros((size,), self.dtype)
        on_diag = coo.col == coo.row + k
        target = jnp.where(on_diag, coo.col - max(k, 0), size)
        return out.at[target].add(jnp.where(on_diag, coo.data, 0),
                                  mode="drop")
