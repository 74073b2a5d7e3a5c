"""Pallas TPU kernel: SpMV (y = A @ x, CSR) via one-hot MXU contraction.

Replaces the XLA gather + segment-sum SpMV (~8-19 ns/element serial loops,
round-1: 24 Mnnz/s at 10k/1e-3) with a fully vectorised pipeline; the
reference rides cuSPARSE's tuned SpMV instead (/root/reference
modify_src/cupy-src/cupyx/cusparse.py:1373-1438).

TPU has no vector gather across sublanes, so x[cols] is computed on the
MXU: with x resident in VMEM as (128, KQ) (column-major blocks of 128
lanes), the lane one-hot L (CH, 128) of col&127 contracts against x to
give P[e, q] = x[128q + (col_e & 127)] for every block q at once; the
block one-hot mask Q (CH, KQ) then selects the single correct q per entry
(an exact select — each row of Q has one nonzero).  The per-entry product
z = val * x[col] reduces into the bounded row window [r0, r0+W) of the
output with the same compare-generated one-hot row matrix used by the
densify kernel (kernels/densify_onehot).

U sub-chunks run per grid step (static unroll) to amortise Mosaic's
~2.5 µs fixed cost per step; entry metadata is packed (CH, U) — sub-chunk
per lane — so VMEM blocks are dense.

Exactness: x and z travel as mantissa-masked bf16 triples (hi+mid+lo
reconstructs f32 bitwise; see _primitives._bf16_split3), so the only
roundings are the val*x[col] product and the per-row f32 accumulation —
the same as any f32 SpMV, in a fixed (entry-order) reduction order:
deterministic across runs.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from spmm_tpu.utils import memtrace

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32

CH_DEFAULT = 1024
U_DEFAULT = 16
W_MAX = 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def spmv_onehot_plan(indptr_host, m: int, n: int,
                     ch: int = CH_DEFAULT,
                     w_max: int = W_MAX,
                     unroll: int = U_DEFAULT) -> Optional[tuple]:
    """Static chunk plan (r0s, W, CH, U) for the SpMV kernel, or None when
    it does not apply (empty matrix, ultra-sparse row spans, x or y too
    large for VMEM)."""
    indptr_host = np.asarray(indptr_host)
    nnz = int(indptr_host[-1])
    if nnz == 0:
        return None
    # x: (128, KQ) f32 triple; y: (m_pad, 1) f32 occupies a full
    # (8, 128) tile per 8 rows
    if n * 4 * 3 > 3 * 2**20 or (-(-m // 8)) * 4096 > 8 * 2**20:
        return None
    nchunks = -(-nnz // ch)
    nsteps = -(-nchunks // unroll)
    nchunks = nsteps * unroll
    starts = np.arange(nchunks, dtype=np.int64) * ch
    ends = np.maximum(np.minimum(starts + ch, nnz) - 1, 0)
    starts_c = np.minimum(starts, nnz - 1)
    row_s = np.searchsorted(indptr_host, starts_c, side="right") - 1
    row_e = np.searchsorted(indptr_host, ends, side="right") - 1
    r0 = (row_s // 8) * 8
    span = int((row_e - r0 + 1).max())
    w = _round_up(span, 16)
    if w > w_max:
        return None
    return (tuple(int(x) for x in r0), w, ch, unroll)


def _kernel(r0s_ref, rows_ref, colq_ref, coll_ref, vals_ref,
            x3_ref, y_ref, *, W: int, KQ: int, KQP: int,
            CH: int, U: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for j in range(U):  # static unroll over the lane-packed sub-chunks
        # lane one-hot of col & 127: (CH, 128)
        lane_oh = (coll_ref[:, j:j + 1]
                   == lax.broadcasted_iota(INDEX_DTYPE, (CH, 128), 1)
                   ).astype(jnp.bfloat16)

        # P[e, q] = x[128q + (col_e & 127)] — exact via the bf16 triple
        def pdot(sl_q, lane_oh=lane_oh):
            return jnp.dot(lane_oh, x3_ref[:, sl_q],
                           preferred_element_type=jnp.float32)

        p = ((pdot(slice(0, KQ)) + pdot(slice(KQP, KQP + KQ)))
             + pdot(slice(2 * KQP, 2 * KQP + KQ)))  # (CH, KQ)

        # block-select: exactly one q matches per entry
        qmask = (colq_ref[:, j:j + 1]
                 == lax.broadcasted_iota(INDEX_DTYPE, (CH, KQ), 1))
        xval = jnp.sum(jnp.where(qmask, p, 0.0), axis=1, keepdims=True)

        z = vals_ref[:, j:j + 1] * xval  # (CH, 1) f32

        # split z exactly into bf16 hi/mid/lo for the reduction matmul
        bits = lax.bitcast_convert_type(z, jnp.int32)
        zhi = lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                       jnp.float32)
        r1 = z - zhi
        bits1 = lax.bitcast_convert_type(r1, jnp.int32)
        zmid = lax.bitcast_convert_type(bits1 & jnp.int32(-65536),
                                        jnp.float32)
        zlo = r1 - zmid
        r0 = r0s_ref[i * U + j]
        # transposed row one-hot: (CH, W), contracted over entries
        eq_t = ((rows_ref[:, j:j + 1] - r0)
                == lax.broadcasted_iota(INDEX_DTYPE, (CH, W), 1)
                ).astype(jnp.bfloat16)

        def ydot(zz, eq_t=eq_t):
            return lax.dot_general(
                eq_t, zz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        y_win = (ydot(zhi) + ydot(zmid)) + ydot(zlo)  # (W, 1)
        s = pl.multiple_of(r0, 8)
        y_ref[pl.ds(s, W), :] += y_win


def _pack_lanes(x, nsteps: int, U: int, CH: int):
    return x.reshape(nsteps, U, CH).transpose(0, 2, 1).reshape(
        nsteps * CH, U)


@functools.partial(memtrace.jit, static_argnames=("m", "n", "plan", "interpret"))
def spmv_onehot(indptr, indices, data, x, m: int, n: int, plan,
                interpret: bool = False):
    """y = A @ x for canonical CSR A (m, n), f32.  `plan` from
    `spmv_onehot_plan` (static)."""
    from spmm_tpu.ops import _primitives as prim

    r0s_t, W, CH, U = plan
    nchunks = len(r0s_t)
    nsteps = nchunks // U
    n_pad = _round_up(n, 128)
    KQ = n_pad // 128
    m_pad = m + W
    nnz = data.shape[0]
    np_total = nchunks * CH

    rows = prim.rows_from_indptr(indptr, nnz)
    colq = indices >> 7
    coll = indices & 127
    vals = data.astype(jnp.float32)
    pad = np_total - nnz
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), m, INDEX_DTYPE)])
        colq = jnp.concatenate([colq, jnp.zeros((pad,), INDEX_DTYPE)])
        coll = jnp.concatenate([coll, jnp.zeros((pad,), INDEX_DTYPE)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.float32)])

    xp = x.astype(jnp.float32)
    if n_pad != n:
        xp = jnp.concatenate([xp, jnp.zeros((n_pad - n,), jnp.float32)])
    # x as (128, KQ): lane l, block q — so lane_oh @ x picks x[128q + l];
    # the three exact bf16 splits are concatenated at 128-lane alignment
    # so the kernel gathers all of them with one wide dot
    KQP = _round_up(KQ, 128)
    xt = xp.reshape(KQ, 128).T
    xhi, xmid, xlo = prim._bf16_split3(xt)

    def _padkq(a):
        if KQP != KQ:
            return jnp.concatenate(
                [a, jnp.zeros((128, KQP - KQ), jnp.bfloat16)], axis=1)
        return a

    x3 = jnp.concatenate([_padkq(xhi), _padkq(xmid), _padkq(xlo)], axis=1)

    rows = _pack_lanes(rows, nsteps, U, CH)
    colq = _pack_lanes(colq, nsteps, U, CH)
    coll = _pack_lanes(coll, nsteps, U, CH)
    vals = _pack_lanes(vals, nsteps, U, CH)
    r0s = jnp.asarray(r0s_t, INDEX_DTYPE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((128, 3 * KQP), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_kernel, W=W, KQ=KQ, KQP=KQP, CH=CH, U=U),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        interpret=interpret,
    )(r0s, rows, colq, coll, vals, x3)
    return y[:m, 0]
