"""Pallas TPU kernel: CSR → dense densification via one-hot MXU matmuls.

Scatter on TPU serialises (~26 ns/element in XLA, and per-element VMEM
stores are little better).  The vectorised alternative expresses placement
as matrix multiplication: for a stripe of H rows and a chunk of E entries,

    dense_stripe (H, k) += U (H, E) @ V (E, k)
    U[r, e] = val[e] * (row[e] == r)      (one-hot rows, value-carrying)
    V[e, c] = (col[e] == c)               (one-hot cols)

Every output element receives at most one nonzero product (canonical CSR ⇒
no duplicates), so the MXU's bf16x3 passes reproduce the fp32 value exactly
(hi+mid+lo splits sum losslessly in the fp32 accumulator) — precision HIGHEST is used (Mosaic supports DEFAULT/HIGHEST only) for bit-exactness; tests compare against the XLA scatter path.

Grid: one program per H-row stripe; entry chunks stream through VMEM via
async DMA with dynamic starts taken from scalar-prefetched stripe offsets
(indptr[::H]), so no host-side grouping and no per-matrix recompilation.

STATUS — measured-alternative lab kernel, not wired into the pipeline.
The per-block `densify_onehot` variant won in-pipeline (0.157 ms vs this
kernel's stripe-streamed form at the 1024^2/0.1 cell; see CLAUDE.md perf
facts) and owns the production path.  This module is kept, with its test
(tests/test_densify_mxu.py), as the reference implementation of the
DMA-streamed variant for future revisits — delete it only together with
that test.
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

H = 128      # rows per stripe (one grid program)
E = 1024     # entries per chunk


def _kernel(starts_ref, rows_ref, cols_ref, vals_ref, out_ref,
            *, k: int, max_chunks: int):
    i = pl.program_id(0)
    s = starts_ref[i]
    cnt = starts_ref[i + 1] - s

    iota_h = lax.broadcasted_iota(INDEX_DTYPE, (H, E), 0)
    iota_e = lax.broadcasted_iota(INDEX_DTYPE, (1, E), 1)
    col_iota = lax.broadcasted_iota(INDEX_DTYPE, (E, k), 1)

    out_ref[...] = jnp.zeros_like(out_ref)

    # Iterate E-aligned global entry chunks overlapping this stripe's
    # [s, s+cnt) range — aligned starts keep Mosaic's tiling prover happy.
    j0 = s // E

    def chunk_body(jj, carry):
        j = j0 + jj

        @pl.when(j * E < s + cnt)
        def _():
            base = pl.multiple_of(j * E, E)
            rows_c = rows_ref[0, pl.ds(base, E)][None, :]   # (1, E)
            cols_c = cols_ref[0, pl.ds(base, E)][None, :]
            vals_c = vals_ref[0, pl.ds(base, E)][None, :]
            gpos = base + iota_e                            # (1, E)
            valid = (gpos >= s) & (gpos < s + cnt)
            rloc = rows_c - i * H                           # (1, E)
            u = jnp.where((iota_h == rloc) & valid,
                          vals_c, 0.0)                      # (H, E)
            cols_col = cols_c.reshape(E, 1)                 # (E, 1)
            v = (cols_col == col_iota).astype(jnp.float32)  # (E, k)
            out_ref[...] += jax.lax.dot_general(
                u, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)

        return carry

    lax.fori_loop(0, max_chunks + 1, chunk_body, 0)


@functools.partial(memtrace.jit, static_argnames=("m", "k", "interpret"))
def csr_densify_mxu(indptr, indices, data, m: int, k: int,
                    interpret: bool = False):
    """Dense (m, k) from canonical CSR via one-hot MXU placement."""
    from spmm_tpu.ops import _primitives as prim

    nnz = data.shape[0]
    if nnz == 0:
        return jnp.zeros((m, k), data.dtype)
    m_pad = ((m + H - 1) // H) * H
    k_pad = ((k + 127) // 128) * 128
    rows = prim.rows_from_indptr(indptr, nnz)
    # stripe starts: indptr sampled every H rows (padded rows are empty);
    # len(indptr_pad) == m_pad + 1 so [::H] yields m_pad/H + 1 offsets.
    indptr_pad = jnp.concatenate(
        [indptr.astype(INDEX_DTYPE),
         jnp.full((m_pad - m,), indptr[-1], INDEX_DTYPE)])
    starts = indptr_pad[::H]
    # pad entry arrays to an E multiple + one spare chunk (aligned loads)
    total = ((nnz + E - 1) // E) * E + E
    pad = total - nnz
    rows_p = jnp.concatenate([rows, jnp.zeros((pad,), INDEX_DTYPE)])[None, :]
    cols_p = jnp.concatenate([indices.astype(INDEX_DTYPE),
                              jnp.zeros((pad,), INDEX_DTYPE)])[None, :]
    vals_p = jnp.concatenate([data.astype(jnp.float32),
                              jnp.zeros((pad,), jnp.float32)])[None, :]
    max_chunks = (nnz + E - 1) // E
    grid = (m_pad // H,)
    out = pl.pallas_call(
        functools.partial(_kernel, k=k_pad, max_chunks=max_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((H, k_pad), lambda i, starts: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, k_pad), jnp.float32),
        interpret=interpret,
    )(starts, rows_p, cols_p, vals_p)
    return out[:m, :k].astype(data.dtype)
