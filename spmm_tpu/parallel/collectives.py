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


def barrier(mesh: Mesh, axis: str) -> None:
    """Synchronization barrier over a mesh axis.

    The reference's `NCCLBackend.barrier` (_nccl_comm.py:139-307)
    all-reduces a dummy scalar so every rank blocks until the whole group
    reaches the call.  The TPU analogue: a 1-element `psum` rides ICI and
    the host blocks on the result, so control returns only after every
    device in the axis has executed the program.  For multi-host process
    synchronization outside a program, prefer
    `jax.experimental.multihost_utils.sync_global_devices`.
    """

    def build():
        @functools.partial(shard_map, mesh=mesh, in_specs=P(),
                           out_specs=P())
        def step(tok):
            return jax.lax.psum(tok, axis)

        return step

    prog = _cached_program_local(("barrier", mesh, axis), build)
    jax.block_until_ready(prog(jnp.ones((1,), jnp.int32)))


def reduce_scatter_dense(x, mesh: Mesh, axis: str):
    """Dense reduce-scatter (`NCCLBackend.reduce_scatter`,
    _nccl_comm.py:139-307): shard d receives rows [d·m/D, (d+1)·m/D) of
    the elementwise sum of every shard's contribution.

    `x`: (D, m, ...) stacked per-shard contributions (laid out along the
    mesh axis by shard_map); returns the (m, ...) sum laid out row-sharded
    along the same axis — one `lax.psum_scatter` riding ICI.
    """
    D = mesh.shape[axis]
    if x.shape[0] != D:
        raise ValueError(f"need one contribution per shard ({D}), "
                         f"got {x.shape[0]}")
    if x.shape[1] % D:
        raise ValueError(f"rows {x.shape[1]} not divisible by {D} shards")

    def build():
        @functools.partial(shard_map, mesh=mesh, in_specs=P(axis),
                           out_specs=P(axis))
        def step(blk):
            return jax.lax.psum_scatter(blk[0], axis,
                                        scatter_dimension=0, tiled=True)

        return step

    prog = _cached_program_local(("reduce_scatter_dense", mesh, axis),
                                 build)
    return prog(x)


def reduce_scatter_csr(mats, mesh: Mesh, axis: str, cap=None):
    """Sparse reduce-scatter: shard d receives row-block d of the summed
    CSR.  The reference exposes reduce_scatter for dense arrays only; the
    sparse analogue here follows its sparse all_reduce recipe
    (reduce + redistribute, _nccl_comm.py:598-604): the deterministic
    replicated sparse sum, then the O(1)-metadata row-block split (sparse
    row extents are runtime values, so the scatter step is a local slice
    of the replicated sum — the padded-wire analogue of reduce +
    scatterv).  Returns the list of D row-block CSRs in shard order."""
    D = mesh.shape[axis]
    s = all_reduce_csr(mats, mesh, axis, cap)
    m = s.shape[0]
    if m % D:
        raise ValueError(f"rows {m} not divisible by {D} shards")
    r = m // D
    return [s[d * r:(d + 1) * r] for d in range(D)]


# ---------------------------------------------------------------------------
# sparse p2p / collectives over padded components
#
# The reference's _SparseNCCLCommunicator (_nccl_comm.py:486-604) moves a
# sparse matrix as a (shape, sizes) metadata exchange followed by its three
# component arrays, with sum_duplicates before send and all_reduce =
# reduce-to-root + bcast.  ICI has no runtime-sized transfers, so here every
# shard speaks the same wire format — (indptr, indices[cap], data[cap],
# nnz) padded to a static capacity — and the collectives are shard_map
# programs over those components.
# ---------------------------------------------------------------------------


def _wire(a: CSR, cap: int):
    ip, ix, dv, nz = pad_csr(a.sum_duplicates(), cap)
    return ip, ix, dv, nz


def ppermute_csr(parts, mesh: Mesh, axis: str, perm):
    """Rotate padded CSR components around the mesh axis (the send/recv
    ring of `_nccl_comm.send`/`recv`).  `parts` = stacked (D, ...) wire
    components; `perm` = [(src, dst), ...] pairs (static)."""

    perm = tuple((int(s), int(d)) for s, d in perm)

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)))
        def step(ip, ix, dv, nz):
            return tuple(
                jax.lax.ppermute(c, axis, perm) for c in (ip, ix, dv, nz))

        return step

    prog = _cached_program_local(("ppermute_csr", mesh, axis, perm), build)
    return prog(*parts)


def broadcast_csr(parts, mesh: Mesh, axis: str, root: int = 0):
    """Every shard receives the root shard's padded CSR components
    (`_nccl_comm.broadcast`)."""

    root = int(root)

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)))
        def step(ip, ix, dv, nz):
            out = []
            for c in (ip, ix, dv, nz):
                g = jax.lax.all_gather(c[0], axis)
                out.append(g[root][None])
            return tuple(out)

        return step

    prog = _cached_program_local(("bcast_csr", mesh, axis, root), build)
    return prog(*parts)


def all_to_all_csr(parts, mesh: Mesh, axis: str):
    """Transpose a (D, D, ...) block matrix of padded CSR components across
    the mesh: shard i sends block j to shard j (`_nccl_comm.all_to_all` —
    the primitive for exchanging partial product rows in distributed
    SpGEMM).  `parts` components carry a leading (D_local=D) block dim."""

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)))
        def step(ip, ix, dv, nz):
            def a2a(c):
                # local block (1, D, ...) → received pieces land on dim0
                # (D, 1, ...) → restore the (1, D, ...) block layout
                r = jax.lax.all_to_all(c, axis, split_axis=1,
                                       concat_axis=0, tiled=False)
                return jnp.moveaxis(r, 0, 1)

            return tuple(a2a(c) for c in (ip, ix, dv, nz))

        return step

    prog = _cached_program_local(("a2a_csr", mesh, axis), build)
    return prog(*parts)


def all_reduce_csr(mats, mesh: Mesh, axis: str, cap=None):
    """Sum one CSR per shard across the mesh axis; every shard receives the
    canonical sum (`_SparseNCCLCommunicator.all_reduce`, which the
    reference implements as reduce-to-root + bcast, _nccl_comm.py:598-604).

    `mats`: list of D same-shape CSR matrices (one per shard position).
    Entries travel in the padded wire format (capacity as the size
    header); each shard canonicalises the all-gathered union locally with
    a stable lexsort + fixed-order segment sum — a deterministic,
    replicated reduction.  Output capacity is D·cap (the worst-case
    disjoint union); the true summed nnz is read back once.
    """
    D = mesh.shape[axis]
    if len(mats) != D:
        raise ValueError(f"need one CSR per shard ({D}), got {len(mats)}")
    shape = mats[0].shape
    if cap is None:
        cap = max(max(a.nnz for a in mats), 1)
    wires = [_wire(a, cap) for a in mats]
    ip = jnp.stack([w[0] for w in wires])
    ix = jnp.stack([w[1] for w in wires])
    dv = jnp.stack([w[2] for w in wires])
    nz = jnp.stack([w[3] for w in wires])
    m, n = shape
    gcap = D * cap

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
            check_vma=False)
        def step(ip_b, ix_b, dv_b, nz_b):
            gip = jax.lax.all_gather(ip_b[0], axis)   # (D, m+1)
            gix = jax.lax.all_gather(ix_b[0], axis)   # (D, cap)
            gdv = jax.lax.all_gather(dv_b[0], axis)
            gnz = jax.lax.all_gather(nz_b[0], axis)   # (D,)
            # union of entries; padding slots get row=m so they sort last
            rows = jax.vmap(
                lambda ipp: prim.rows_from_indptr(ipp, cap))(gip)
            valid = (jnp.arange(cap, dtype=INDEX_DTYPE)[None, :]
                     < gnz[:, None])
            rows = jnp.where(valid, rows, m).reshape(-1)
            cols = jnp.where(valid, gix, 0).reshape(-1)
            vals = jnp.where(valid, gdv, 0).reshape(-1)
            row_s, col_s, (val_s,) = prim.lexsort_rowcol(
                rows, cols, (vals,), (m + 1, n))
            new_g = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_),
                 (row_s[1:] != row_s[:-1]) | (col_s[1:] != col_s[:-1])])
            seg = jnp.cumsum(new_g.astype(INDEX_DTYPE)) - 1
            summed = jax.ops.segment_sum(val_s, seg, num_segments=gcap,
                                         indices_are_sorted=True)
            head = new_g & (row_s < m)
            nnz_u = jnp.sum(head, dtype=INDEX_DTYPE)
            first = prim.compact_positions(head, gcap)
            slot_ok = jnp.arange(gcap, dtype=INDEX_DTYPE) < nnz_u
            out_rows = jnp.where(slot_ok, row_s[first], m)
            out_cols = jnp.where(slot_ok, col_s[first], 0)
            out_vals = jnp.where(slot_ok, summed[seg[first]], 0)
            indptr = jnp.concatenate(
                [jnp.zeros((1,), INDEX_DTYPE),
                 jnp.cumsum(jnp.bincount(
                     out_rows, length=m + 1).astype(INDEX_DTYPE)[:m],
                     dtype=INDEX_DTYPE)])
            return (indptr[None], out_cols[None], out_vals[None],
                    nnz_u[None])

        return step

    prog = _cached_program_local(
        ("all_reduce_csr", mesh, axis, cap, shape), build)
    ip_o, ix_o, dv_o, nz_o = prog(ip, ix, dv, nz)
    nnz_u = int(nz_o[0])
    return unpad_csr(ip_o[0], ix_o[0], dv_o[0], nnz_u, shape)


def reduce_csr(mats, mesh: Mesh, axis: str, root: int = 0, cap=None):
    """Sparse reduce-to-root (`_SparseNCCLCommunicator.reduce`): on TPU the
    replicated all-reduce already leaves the sum on every shard, so the
    root distinction is nominal — returns the summed CSR (what root
    holds)."""
    return all_reduce_csr(mats, mesh, axis, cap)


def send_recv_csr(parts, mesh: Mesh, axis: str, src: int, dst: int):
    """Point-to-point transfer of one shard's padded CSR components
    (`_SparseNCCLCommunicator.send`/`recv`/`send_recv`,
    _nccl_comm.py:525-580: sizes header then payload).  Under SPMD a
    single p2p edge is a one-pair ppermute riding ICI; every other
    shard's slot receives zeros (no peer sent to it), matching NCCL
    semantics where only `dst` posts a receive."""
    return ppermute_csr(parts, mesh, axis, [(int(src), int(dst))])


def scatter_csr(mats, mesh: Mesh, axis: str, root: int = 0, cap=None):
    """Root scatters one CSR to each shard
    (`_SparseNCCLCommunicator.scatter`).  On TPU the root's D matrices
    enter as host values, so scattering is padding to a common capacity
    and laying the stacked wire components out along the mesh axis —
    returns `parts` (the (D, ...) wire format) ready for sharded
    consumption; pair with `unpad_csr(parts[...][d])` per shard."""
    D = mesh.shape[axis]
    if len(mats) != D:
        raise ValueError(f"need one CSR per shard ({D}), got {len(mats)}")
    if cap is None:
        cap = max(max(a.nnz for a in mats), 1)
    wires = [_wire(a, cap) for a in mats]
    return tuple(jnp.stack([w[i] for w in wires]) for i in range(4))


def gather_csr(parts, mesh: Mesh, axis: str, root: int = 0, shape=None):
    """Gather every shard's padded CSR onto the root
    (`_SparseNCCLCommunicator.gather`): an all_gather of the wire
    components (replication is how a root copy materialises on ICI),
    unpacked into a list of CSR matrices in shard order."""
    D = mesh.shape[axis]

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=(P(), P(), P(), P()),
            check_vma=False)
        def step(ip, ix, dv, nz):
            return tuple(jax.lax.all_gather(c[0], axis)
                         for c in (ip, ix, dv, nz))

        return step

    prog = _cached_program_local(("gather_csr", mesh, axis), build)
    gip, gix, gdv, gnz = prog(*parts)
    if shape is None:
        raise ValueError("gather_csr needs the (m, n) block shape")
    return [unpad_csr(gip[d], gix[d], gdv[d], int(gnz[d]), shape)
            for d in range(D)]


def _cached_program_local(key, builder):
    from spmm_tpu.parallel.sharded import _cached_program

    return _cached_program(key, builder)
