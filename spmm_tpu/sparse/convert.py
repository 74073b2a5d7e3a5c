"""Dense <-> sparse conversion entry points.

Re-provides cuSPARSE `denseToSparse` / `sparseToDense`
(/root/reference modify_src/cupy-src/cupyx/cusparse.py:1733, :1805): the
nonzero count is computed on device and read back once (the analogue of the
reference's `nnz` query), then a static-shape extraction kernel runs.
"""

from __future__ import annotations

import jax.numpy as jnp

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.coo import COO


def dense_to_coo(x) -> COO:
    x = jnp.asarray(x)
    if x.ndim != 2:
        raise ValueError("expected a 2-D array")
    nnz = int(prim.count_nonzero_dense(x))
    row, col, data = prim.dense_to_coo(x, nnz)
    return COO.from_parts(row, col, data, x.shape, canonical=True)


def dense_to_csr(x):
    return dense_to_coo(x).tocsr()


def dense_to_csc(x):
    return dense_to_coo(x).tocsc()


def to_dense(a):
    from spmm_tpu.sparse.base import issparse

    return a.toarray() if issparse(a) else jnp.asarray(a)
