"""Pallas TPU kernel: streaming CSR → dense densification.

Replaces XLA's serialised HBM scatter (~18 ns/element) with an on-chip
streaming loop: entry chunks arrive in SMEM (scalar memory — grid-indexed
BlockSpecs, the only SMEM access pattern Mosaic accepts), and each entry
performs one vector select into a register-resident accumulator holding the
*current row* as a (k/128, 128) tile stack.  The accumulator is flushed to
the VMEM-resident output only on row changes (≈ once per nnz/m entries),
and rows are loaded back at chunk boundaries, so a row spanning chunks
accumulates correctly (the sequential TPU grid guarantees ordering).

Output layout is (m+1, k/128, 128) — row-major identical to (m+1, k), so
the caller reshapes for free; the +1 row absorbs sentinel-padded entries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spmm_tpu.utils import memtrace
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32

CH = 2048  # entries per grid chunk


def _kernel(rows_ref, cols_ref, vals_ref, out_ref, *, kb: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    flat_lane = (
        lax.broadcasted_iota(INDEX_DTYPE, (kb, 128), 0) * 128
        + lax.broadcasted_iota(INDEX_DTYPE, (kb, 128), 1))

    r0 = rows_ref[0]
    acc0 = out_ref[r0]

    def body(e, carry):
        acc, cur = carry
        r = rows_ref[e]
        c = cols_ref[e]
        v = vals_ref[e]

        def changed_fn(args):
            acc, cur = args
            out_ref[cur] = acc      # flush finished row
            return out_ref[r]       # begin (or resume) row r

        def same_fn(args):
            return args[0]

        acc = lax.cond(r != cur, changed_fn, same_fn, (acc, cur))
        acc = jnp.where(flat_lane == c, v, acc)
        return acc, r

    acc_f, cur_f = lax.fori_loop(0, CH, body, (acc0, r0))
    out_ref[cur_f] = acc_f


@functools.partial(memtrace.jit, static_argnames=("m", "k", "interpret"))
def densify_stream(rows, cols, vals, m: int, k: int,
                   interpret: bool = False):
    """Dense (m, k) from sorted COO entry arrays (canonical order)."""
    if k % 128:
        raise ValueError("k must be a multiple of 128 (pad the matrix)")
    kb = k // 128
    nnz = vals.shape[0]
    if nnz == 0:
        return jnp.zeros((m, k), vals.dtype)
    pad = (-nnz) % CH
    rows_p = jnp.concatenate(
        [rows.astype(INDEX_DTYPE),
         jnp.full((pad,), m, INDEX_DTYPE)]) if pad else rows.astype(
             INDEX_DTYPE)
    cols_p = jnp.concatenate(
        [cols.astype(INDEX_DTYPE),
         jnp.zeros((pad,), INDEX_DTYPE)]) if pad else cols.astype(
             INDEX_DTYPE)
    vals_p = jnp.concatenate(
        [vals, jnp.zeros((pad,), vals.dtype)]) if pad else vals
    total = rows_p.shape[0]
    out = pl.pallas_call(
        functools.partial(_kernel, kb=kb),
        grid=(total // CH,),
        in_specs=[
            pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CH,), lambda i: (i,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((m + 1, kb, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m + 1, kb, 128), vals.dtype),
        interpret=interpret,
    )(rows_p, cols_p, vals_p)
    return out[:m].reshape(m, k)


def csr_densify_stream(indptr, indices, data, m: int, k: int,
                       mark_tiny: bool = False, interpret: bool = False):
    """CSR → dense via the streaming kernel (k padded to 128 internally)."""
    import numpy as np

    from spmm_tpu.ops import _primitives as prim

    nnz = data.shape[0]
    rows = prim.rows_from_indptr(indptr, nnz)
    vals = data
    if mark_tiny:
        tiny = jnp.asarray(np.finfo(np.float32).tiny, data.dtype)
        vals = jnp.where(data == 0, tiny, data)
    k_pad = ((k + 127) // 128) * 128
    out = densify_stream(rows, indices, vals, m, k_pad,
                         interpret=interpret)
    return out[:, :k]
