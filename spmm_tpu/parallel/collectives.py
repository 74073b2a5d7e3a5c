"""Sparse collectives: transferring sparse matrices between shards/hosts.

Mirrors the reference's `_SparseNCCLCommunicator` protocol (/root/reference
modify_src/cupy-src/cupyx/distributed/_nccl_comm.py:486-604): a sparse matrix
moves as its component arrays with a size header exchanged first.  On TPU
there are no runtime-sized sends, so the protocol becomes: (1) all_gather the
int32 size headers, (2) pad components to the global max, (3) all_gather the
padded payloads — exactly the survey's prescription (SURVEY.md §5, last row).

These run under `shard_map`; the `*_host` variants are eager multi-host
helpers using `jax.experimental.multihost_utils`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.csr import CSR

INDEX_DTYPE = prim.INDEX_DTYPE

shard_map = jax.shard_map


def pad_csr(a: CSR, capacity: int) -> Tuple[jax.Array, jax.Array, jax.Array,
                                            jax.Array]:
    """(indptr, indices[cap], data[cap], nnz) — the padded wire format."""
    if capacity < a.nnz:
        raise ValueError(f"capacity {capacity} < nnz {a.nnz}")
    pad = capacity - a.nnz
    indices = jnp.pad(a.indices, (0, pad))
    data = jnp.pad(a.data, (0, pad))
    return a.indptr, indices, data, jnp.asarray(a.nnz, INDEX_DTYPE)


def unpad_csr(indptr, indices, data, nnz: int, shape) -> CSR:
    nnz = int(nnz)
    return CSR.from_parts(indptr, indices[:nnz], data[:nnz], shape,
                          canonical=True)


def all_gather_csr_blocks(a_sharded, mesh: Mesh, axis: str = "rows"):
    """All-gather the padded row-blocks of a ShardedCSR onto every device.

    Returns (indptr (D, r+1), indices (D, E), data (D, E), nnz (D,)) fully
    replicated — each device then holds every shard (the sparse all_gather
    of `_nccl_comm.py` without runtime sizes: capacity is already the
    per-shard max, i.e. the "pad to per-step max" rule).
    """

    from spmm_tpu.parallel.sharded import _cached_program

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)  # all_gather output replicated by construction
        def gather(ip, ix, dv, nz):
            return (jax.lax.all_gather(ip[0], axis),
                    jax.lax.all_gather(ix[0], axis),
                    jax.lax.all_gather(dv[0], axis),
                    jax.lax.all_gather(nz[0], axis))

        return gather

    prog = _cached_program(("all_gather_csr", mesh, axis), build)
    return prog(a_sharded.indptr, a_sharded.indices, a_sharded.data,
                a_sharded.nnz_local)


def psum_dense(x, mesh: Mesh, axis: str):
    """Dense all-reduce over a mesh axis (NCCLBackend.all_reduce analogue)."""

    from spmm_tpu.parallel.sharded import _cached_program

    def build():
        @functools.partial(shard_map, mesh=mesh, in_specs=P(axis),
                           out_specs=P())
        def reduce(blk):
            return jax.lax.psum(blk.sum(axis=0), axis)

        return reduce

    prog = _cached_program(("psum_dense", mesh, axis), build)
    return prog(x)
