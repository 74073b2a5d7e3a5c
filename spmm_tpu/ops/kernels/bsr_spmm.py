"""Pallas TPU kernel: block-sparse (BSR) @ dense SpMM.

The MXU path for structured sparsity: A is BSR with hardware-aligned dense
blocks; the kernel walks each block row, DMA-ing exactly the B tiles named
by the block-column indices (scalar-prefetched so the index arithmetic
happens before the kernel body — the PrefetchScalarGridSpec pattern from
the Pallas guide) and accumulating one (R, TN) output tile per (block-row,
N-tile) grid cell.

Compared with the XLA `dot_general` BSR path (spmm.py `_bsr_spmm`), this
kernel never materialises gathered B slabs in HBM: B tiles stream straight
into VMEM per step.  FLOPs are identical; HBM traffic drops from
O(nblocks·C·N + dense) to O(touched B tiles).

MEASURED VERDICT (v5e, round 3, genuinely-dense 128×128 blocks from
models.block_sparse, B=(n,256), slope protocol): the XLA `_bsr_spmm`
path wins everywhere — 0.203 vs 0.388 ms at 4096²/block-density 0.05,
1.06 vs 1.65 at 0.15, 0.56 vs 0.92 at 8192²/0.02 — the per-step grid
overhead outweighs the HBM-traffic saving at these shapes.  BSR itself
earns its place against the dense route at low block density (XLA BSR
0.203 vs dense-MXU 0.298 ms at 4096²/0.05; dense wins past ~0.1), so
`spmm` keeps `_bsr_spmm` as the BSR default and this kernel stays
opt-in (`via="bsr_pallas"`).

Grid: (mb, N/TN, S) with S = max blocks per block-row; step s beyond a
row's count is masked (pl.when) and its DMA aliased to a safe tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32


def _kernel(indptr_ref, indices_ref, a_blocks_ref, b_ref, out_ref):
    r = pl.program_id(0)
    s = pl.program_id(2)
    start = indptr_ref[r]
    count = indptr_ref[r + 1] - start

    @pl.when(s == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(s < count)
    def _():
        # HIGHEST: f32-grade accumulation — DEFAULT would run one lossy
        # bf16 pass on the MXU (~1e-3 rel error, fails SciPy parity).
        out_ref[...] += jnp.dot(
            a_blocks_ref[0], b_ref[...],
            preferred_element_type=out_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )


def bsr_spmm_pallas(indptr, indices, blocks, b, *, max_blocks_per_row: int,
                    tn: int = 128, interpret: bool = False):
    """C = A_bsr @ B via the Pallas kernel.

    blocks: (nblocks, R, C); b: (K, N) with K a multiple of C and N a
    multiple of tn.  `max_blocks_per_row` must bound every block row
    (host-computed from indptr).
    """
    nblocks, R, C = blocks.shape
    K, N = b.shape
    mb = indptr.shape[0] - 1
    if K % C or N % tn:
        raise ValueError(f"B shape {b.shape} not tiled by ({C}, {tn})")
    if nblocks == 0:
        return jnp.zeros((mb * R, N), blocks.dtype)
    S = max(int(max_blocks_per_row), 1)

    grid = (mb, N // tn, S)

    def a_index(r, j, s, indptr_ref, indices_ref):
        pos = indptr_ref[r] + s
        last = indptr_ref[r + 1] - 1
        return (jnp.minimum(pos, jnp.maximum(last, 0)), 0, 0)

    def b_index(r, j, s, indptr_ref, indices_ref):
        pos = indptr_ref[r] + s
        last = indptr_ref[r + 1] - 1
        blk = indices_ref[jnp.minimum(pos, jnp.maximum(last, 0))]
        return (blk, j)

    def out_index(r, j, s, indptr_ref, indices_ref):
        return (r, j)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, R, C), a_index),
            pl.BlockSpec((C, tn), b_index),
        ],
        out_specs=pl.BlockSpec((R, tn), out_index),
    )
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((mb * R, N), blocks.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nblocks * R * C * N,
            bytes_accessed=(blocks.size + b.size + mb * R * N) * 4,
            transcendentals=0,
        ),
    )(indptr.astype(INDEX_DTYPE), indices.astype(INDEX_DTYPE), blocks, b)
    return out


def spmm_bsr_pallas(a_bsr, b, interpret: bool = False):
    """Eager wrapper: C = A @ B with A a spmm_tpu BSR matrix."""
    import numpy as np

    indptr_h = np.asarray(a_bsr.indptr)
    max_blk = int(np.max(np.diff(indptr_h))) if len(indptr_h) > 1 else 0
    m, _ = a_bsr.shape
    R, C = a_bsr.blocksize
    K = b.shape[0]
    pad_k = (-K) % C
    if pad_k:
        b = jnp.pad(b, ((0, pad_k), (0, 0)))
    n = b.shape[1]
    pad_n = (-n) % 128
    if pad_n:
        b = jnp.pad(b, ((0, 0), (0, pad_n)))
    out = bsr_spmm_pallas(a_bsr.indptr, a_bsr.indices, a_bsr.data, b,
                          max_blocks_per_row=max_blk, interpret=interpret)
    return out[:m, :n]
