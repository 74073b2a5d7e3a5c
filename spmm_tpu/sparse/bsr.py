"""BSR (block sparse row) matrix — the TPU-tiled sparse format.

The reference has no BSR (cuSPARSE's generic API is pointwise CSR/COO), but
the TPU build adds it as a first-class format because the MXU/VPU operate on
(sublane, lane) = (8, 128) dense tiles: a BSR with hardware-aligned blocks
turns SpMM/SpMV into a sequence of dense tile ops at full throughput, which
pointwise CSR gathers cannot reach (see SURVEY.md §7 "hard parts").

Storage: ``data`` of shape (nblocks, R, C), ``indices`` = block-column ids,
``indptr`` over block rows.  Default block is (8, 128) for float32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.base import SparseMatrix

INDEX_DTYPE = prim.INDEX_DTYPE

DEFAULT_BLOCKSIZE = (8, 128)


@jax.tree_util.register_pytree_node_class
class BSR(SparseMatrix):
    format = "bsr"

    def __init__(self, arg1, shape=None, dtype=None, blocksize=None):
        if isinstance(arg1, tuple) and len(arg1) == 3:
            data, indices, indptr = arg1
            self.data = jnp.asarray(data, dtype=dtype)
            if self.data.ndim != 3:
                raise ValueError("BSR data must be (nblocks, R, C)")
            self.indices = jnp.asarray(indices, INDEX_DTYPE)
            self.indptr = jnp.asarray(indptr, INDEX_DTYPE)
            if shape is None:
                mb = self.indptr.shape[0] - 1
                nb = int(jnp.max(self.indices)) + 1 if self.indices.shape[0] else 0
                R, C = self.data.shape[1:]
                shape = (mb * R, nb * C)
            self._shape = (int(shape[0]), int(shape[1]))
        else:
            b = csr_to_bsr(
                arg1.tocsr() if hasattr(arg1, "tocsr") else None,
                blocksize=blocksize,
            )
            self.data, self.indices, self.indptr = b.data, b.indices, b.indptr
            self._shape = b._shape

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.data, self.indices, self.indptr), (self._shape,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.indices, obj.indptr = children
        (obj._shape,) = aux
        return obj

    @classmethod
    def from_parts(cls, indptr, indices, data, shape):
        obj = cls.__new__(cls)
        obj.indptr = jnp.asarray(indptr, INDEX_DTYPE)
        obj.indices = jnp.asarray(indices, INDEX_DTYPE)
        obj.data = jnp.asarray(data)
        obj._shape = (int(shape[0]), int(shape[1]))
        return obj

    # -- properties ---------------------------------------------------------

    @property
    def blocksize(self) -> Tuple[int, int]:
        return (int(self.data.shape[1]), int(self.data.shape[2]))

    @property
    def nblocks(self) -> int:
        return int(self.data.shape[0])

    @property
    def nnz(self) -> int:
        # stored elements (block-padded), scipy-compatible definition
        R, C = self.blocksize
        return self.nblocks * R * C

    @property
    def block_density(self) -> float:
        mb = (self._shape[0] + self.blocksize[0] - 1) // self.blocksize[0]
        nb = (self._shape[1] + self.blocksize[1] - 1) // self.blocksize[1]
        return self.nblocks / float(mb * nb) if mb and nb else 0.0

    @property
    def block_rows(self):
        return prim.rows_from_indptr(self.indptr, self.nblocks)

    def _with_data(self, data):
        return BSR.from_parts(self.indptr, self.indices, data, self._shape)

    # -- conversions --------------------------------------------------------

    def tobsr(self, blocksize=None):
        if blocksize is None or tuple(blocksize) == self.blocksize:
            return self
        return csr_to_bsr(self.tocsr(), blocksize=blocksize)

    def toarray(self, order=None, out=None):
        self._check_order(order, out)
        m, n = self._shape
        R, C = self.blocksize
        mb = (m + R - 1) // R
        nb = (n + C - 1) // C
        out = jnp.zeros((mb * R, nb * C), self.data.dtype)
        brow = self.block_rows
        # scatter dense blocks: out[brow*R:(brow+1)*R, bcol*C:(bcol+1)*C]
        out = out.reshape(mb, R, nb, C).transpose(0, 2, 1, 3)
        out = out.at[brow, self.indices].add(self.data)
        out = out.transpose(0, 2, 1, 3).reshape(mb * R, nb * C)
        return out[:m, :n]

    def tocoo(self):
        from spmm_tpu.sparse import convert

        return convert.dense_to_coo(self.toarray())

    def tocsr(self):
        return self.tocoo().tocsr()

    def transpose(self):
        return self.tocsr().transpose().tobsr(
            blocksize=(self.blocksize[1], self.blocksize[0]))


def csr_to_bsr(a, blocksize: Optional[Tuple[int, int]] = None) -> BSR:
    """Re-tile a canonical CSR into hardware-aligned dense blocks.

    Only blocks containing at least one nonzero are stored.  The matrix is
    logically zero-padded up to a multiple of the block size.
    """
    if blocksize is None:
        blocksize = DEFAULT_BLOCKSIZE
    R, C = int(blocksize[0]), int(blocksize[1])
    a = a.sum_duplicates()
    m, n = a.shape
    mb = (m + R - 1) // R
    nb = (n + C - 1) // C
    row = a.rows
    col = a.indices
    brow = row // R
    bcol = col // C
    # block ids in (brow, bcol) lex order; entries of canonical CSR are
    # already lex-sorted by (row, col) but not by (brow, bcol) → sort.
    brow_s, bcol_s, (r_in, c_in, d_s) = prim.lexsort_rowcol(
        brow, bcol, (row % R, col % C, a.data), (mb, nb))
    nblocks = int(prim.count_unique_sorted(brow_s, bcol_s))
    if a.nnz == 0:
        data = jnp.zeros((0, R, C), a.dtype)
        indices = jnp.zeros((0,), INDEX_DTYPE)
        indptr = jnp.zeros((mb + 1,), INDEX_DTYPE)
        return BSR.from_parts(indptr, indices, data, (m, n))
    new_block = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_),
         (brow_s[1:] != brow_s[:-1]) | (bcol_s[1:] != bcol_s[:-1])])
    block_id = jnp.cumsum(new_block.astype(INDEX_DTYPE)) - 1
    data = jnp.zeros((nblocks, R, C), a.dtype)
    data = data.at[block_id, r_in, c_in].add(d_s)
    first_pos = prim.compact_positions(new_block, nblocks)
    ub_row = brow_s[first_pos]
    ub_col = bcol_s[first_pos]
    indptr = prim.build_indptr(ub_row, mb)
    return BSR.from_parts(indptr, ub_col, data, (m, n))
