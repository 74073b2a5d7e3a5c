"""2-D (SUMMA-style) distributed dense-intermediate SpGEMM.

The 1-D row sharding in `sharded.py` replicates B; on larger meshes the
bandwidth-optimal layout is 2-D: A row-sharded on axis 'x', B column-sharded
on axis 'y', C block-sharded on ('x', 'y').  Rather than hand-writing the
SUMMA broadcast rings, the dense-intermediate formulation lets GSPMD insert
the collectives: we densify each operand shard locally (shard_map), then a
single `jnp.dot` under sharding constraints becomes the SUMMA loop — XLA
emits the all-gathers along the contraction axis and keeps them on ICI.

This mirrors how the rest of the framework treats XLA: pick shardings, let
the compiler place collectives (the scaling-book recipe), reserving
shard_map for the parts XLA cannot infer (the local densifies).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.parallel.sharded import (ShardedCSR, _cached_program,
                                       _local_rows)

INDEX_DTYPE = prim.INDEX_DTYPE

shard_map = jax.shard_map


def make_mesh_2d(nx: int, ny: int) -> Mesh:
    import numpy as np

    devices = jax.devices()
    if nx * ny > len(devices):
        raise ValueError(f"mesh {nx}x{ny} needs {nx * ny} devices, "
                         f"have {len(devices)}")
    return Mesh(np.asarray(devices[: nx * ny]).reshape(nx, ny), ("x", "y"))


def _densify_rows_sharded(a: ShardedCSR, mesh: Mesh, axis: str):
    """Row-sharded dense matrix from a ShardedCSR (local scatters)."""

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis))
        def densify(indptr_blk, indices_blk, data_blk):
            def one(ip, ix, dv):
                E = dv.shape[0]
                m_local = ip.shape[0] - 1
                rows = _local_rows(ip, E)
                k = a.shape[1]
                flat = rows * jnp.asarray(k, INDEX_DTYPE) + ix
                return jnp.zeros((m_local * k,), dv.dtype).at[flat].add(
                    dv, mode="drop").reshape(m_local, k)

            return jax.vmap(one)(indptr_blk, indices_blk, data_blk)

        return densify

    prog = _cached_program(("densify_rows", mesh, axis, a.shape[1]), build)
    return prog(a.indptr, a.indices, a.data)


def spgemm_summa(a: ShardedCSR, b: ShardedCSR, mesh: Mesh):
    """C_dense = A @ B on a 2-D mesh: A rows on 'x', B rows on 'x' →
    densified then re-laid out so the matmul contracts across the mesh.

    Returns the dense product sharded P('x', 'y').  (Sparse compression of
    a block-sharded result is a host-side gather via `jax.device_get`.)
    """
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    # densify shards locally on the 'x' axis (both operands row-sharded)
    from spmm_tpu.parallel.sharded import unshard_rows

    ad = _densify_rows_sharded(a, mesh, "x")      # (D_x, m/D_x, k) blocks
    bd = _densify_rows_sharded(b, mesh, "x")
    ad_full = unshard_rows(ad, m, a.row_bounds)   # (m, k)
    bd_full = unshard_rows(bd, k2, b.row_bounds)  # (k, n)

    # GSPMD 2-D matmul: A (m,k) sharded (x, None); B (k,n) sharded (None, y)
    # → C (m,n) sharded (x, y) with XLA inserting the contraction
    # collectives (the SUMMA pattern).
    from spmm_tpu.parallel.sharded import _PROGRAM_CACHE

    key = ("summa_mm", mesh, m, k, n)
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = jax.jit(
            lambda x, y: jnp.dot(x, y, preferred_element_type=x.dtype,
                                 precision=jax.lax.Precision.HIGHEST),
            out_shardings=NamedSharding(mesh, P("x", "y")))
        _PROGRAM_CACHE[key] = prog
    ad_full = jax.device_put(ad_full, NamedSharding(mesh, P("x", None)))
    bd_full = jax.device_put(bd_full, NamedSharding(mesh, P(None, "y")))
    return prog(ad_full, bd_full)
