"""Row-partitioned sparse matrices over a device mesh.

The TPU-native re-design of the reference's distributed capability
(SURVEY.md §2.2 `_SparseNCCLCommunicator`, §5 "Distributed communication
backend"): instead of NCCL point-to-point sends of (shape, sizes) metadata
then three component arrays (_nccl_comm.py:525-580), matrices are laid out as
**static, equal-shape per-device shards** — nnz is padded to the per-shard
maximum (the "pad to per-step max + size header" protocol the survey
prescribes for ICI) — and every op is a `shard_map` program whose collectives
(psum / all_gather) ride ICI.

Sharding scheme (1-D 'rows' mesh):
  * rows are split into contiguous balanced blocks (by rows or by nnz);
  * each shard stores a local CSR (indptr over local rows, indices, data)
    padded to the max shard nnz — padding entries carry data=0 so they are
    arithmetically inert and need no masking in SpMV/SpMM;
  * `row_bounds` is static host metadata (the "size header").
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.sparse.csr import CSR

INDEX_DTYPE = prim.INDEX_DTYPE

shard_map = jax.shard_map


@jax.tree_util.register_pytree_node_class
class ShardedCSR:
    """Equal-shape row shards of a CSR, stacked on a leading device axis.

    indptr: (D, rows_per_shard + 1) — local row pointers
    indices: (D, E) int32, data: (D, E) — padded to E = max shard nnz
    nnz_local: (D,) int32 — the valid-entry count ("size header")
    """

    def __init__(self, indptr, indices, data, nnz_local, shape, row_bounds):
        self.indptr = indptr
        self.indices = indices
        self.data = data
        self.nnz_local = nnz_local
        self._shape = (int(shape[0]), int(shape[1]))
        self.row_bounds = tuple(int(b) for b in row_bounds)

    # -- pytree -------------------------------------------------------------

    def tree_flatten(self):
        return (self.indptr, self.indices, self.data, self.nnz_local), (
            self._shape, self.row_bounds)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.indptr, obj.indices, obj.data, obj.nnz_local = children
        obj._shape, obj.row_bounds = aux
        return obj

    @property
    def shape(self):
        return self._shape

    @property
    def n_shards(self) -> int:
        return int(self.indptr.shape[0])

    @property
    def rows_per_shard(self) -> int:
        return int(self.indptr.shape[1]) - 1

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(jnp.sum(self.nnz_local))


def shard_csr(a: CSR, mesh: Mesh, axis: str = "rows",
              balance: str = "rows") -> ShardedCSR:
    """Partition a CSR's rows across `mesh[axis]` into equal-shape shards.

    balance="rows": equal row counts; "nnz": contiguous blocks balanced by
    nnz (better for skewed matrices — cf. models.power_law_rows).
    Rows are padded up to D * rows_per_shard with empty rows.
    """
    a = a.tocsr().sum_duplicates()
    m, n = a.shape
    D = mesh.shape[axis]
    indptr_h = np.asarray(a.indptr)
    if balance == "nnz":
        total = int(indptr_h[-1])
        targets = [(total * (i + 1)) // D for i in range(D - 1)]
        cuts = [0] + [int(np.searchsorted(indptr_h, t, side="left"))
                      for t in targets] + [m]
        cuts = sorted(set(cuts))
        while len(cuts) < D + 1:
            cuts.append(m)
        bounds = cuts[:D] + [m]
    else:
        per = -(-m // D)
        bounds = [min(i * per, m) for i in range(D)] + [m]
    rows_per_shard = max(bounds[i + 1] - bounds[i] for i in range(D))
    nnz_per = [int(indptr_h[bounds[i + 1]] - indptr_h[bounds[i]])
               for i in range(D)]
    E = max(max(nnz_per), 1)
    indptr_s = np.zeros((D, rows_per_shard + 1), np.int32)
    indices_s = np.zeros((D, E), np.int32)
    data_s = np.zeros((D, E), np.asarray(a.data).dtype)
    indices_h = np.asarray(a.indices)
    data_h = np.asarray(a.data)
    for i in range(D):
        r0, r1 = bounds[i], bounds[i + 1]
        e0, e1 = int(indptr_h[r0]), int(indptr_h[r1])
        local = indptr_h[r0:r1 + 1] - indptr_h[r0]
        indptr_s[i, :r1 - r0 + 1] = local
        indptr_s[i, r1 - r0 + 1:] = local[-1]  # trailing empty rows
        indices_s[i, :e1 - e0] = indices_h[e0:e1]
        data_s[i, :e1 - e0] = data_h[e0:e1]
    sharding = NamedSharding(mesh, P(axis))
    return ShardedCSR(
        jax.device_put(jnp.asarray(indptr_s), sharding),
        jax.device_put(jnp.asarray(indices_s), sharding),
        jax.device_put(jnp.asarray(data_s), sharding),
        jax.device_put(jnp.asarray(nnz_per, INDEX_DTYPE), sharding),
        (m, n), bounds)


def unshard_rows(y, shape_m: int, row_bounds: Sequence[int]):
    """Concatenate per-shard row blocks back to a global array (host order).

    Because trailing pad rows are at the end of each shard, slices are taken
    per shard before concatenation.
    """
    D = y.shape[0]
    parts = []
    for i in range(D):
        r0, r1 = row_bounds[i], row_bounds[i + 1]
        parts.append(y[i, : r1 - r0])
    return jnp.concatenate(parts, axis=0)


# ---------------------------------------------------------------------------
# sharded ops (shard_map programs)
#
# Programs are constructed once per (mesh, axis) and jitted — rebuilding the
# shard_map closure per call would retrace and recompile every time.
# ---------------------------------------------------------------------------

_PROGRAM_CACHE: dict = {}


def _cached_program(key, builder):
    prog = _PROGRAM_CACHE.get(key)
    if prog is None:
        prog = jax.jit(builder())
        _PROGRAM_CACHE[key] = prog
    return prog


def _local_rows(indptr, E: int):
    """Per-entry row ids from a local indptr (marks+cumsum, no
    searchsorted — see ops/_primitives.rows_from_indptr)."""
    marks = jnp.zeros((E + 1,), INDEX_DTYPE).at[indptr[1:]].add(
        1, mode="drop")
    return jnp.cumsum(marks[:E], dtype=INDEX_DTYPE)


def _local_spmv(indptr, indices, data, x):
    """Local CSR·x on one shard; padding entries carry 0 data."""
    E = data.shape[0]
    m_local = indptr.shape[0] - 1
    rows = _local_rows(indptr, E)
    prod = data * x[indices]
    return jax.ops.segment_sum(prod, rows, num_segments=m_local,
                               indices_are_sorted=True)


def spmv_sharded(a: ShardedCSR, x, mesh: Mesh, axis: str = "rows"):
    """y = A @ x with A row-sharded, x replicated; y row-sharded.

    The x replication is the all-gather of vector segments the survey maps
    from the reference's halo exchange (SURVEY.md §5 long-context row).
    """

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(axis))
        def step(indptr_blk, indices_blk, data_blk, x_full):
            return jax.vmap(
                lambda ip, ix, dv: _local_spmv(ip, ix, dv, x_full)
            )(indptr_blk, indices_blk, data_blk)

        return step

    prog = _cached_program(("spmv", mesh, axis), build)
    return prog(a.indptr, a.indices, a.data, x)


@jax.tree_util.register_pytree_node_class
class SpmvStreamPlan:
    """Host-built layout for the x-streaming ring SpMV: each device's
    entries grouped by x column-block, padded per (device, block) to Eb.

    rows/cols/data: (D, D*Eb) — block j of device i lives at
    [i, j*Eb:(j+1)*Eb]; cols are block-local (ix - j*nb); padding rows
    point at the drop segment r_local.  nb = x block width, Eb = max
    per-(device, block) entry count.
    """

    def __init__(self, rows, cols, data, nb, Eb, r_local, n):
        self.rows = rows
        self.cols = cols
        self.data = data
        self.nb = int(nb)
        self.Eb = int(Eb)
        self.r_local = int(r_local)
        self.n = int(n)

    def tree_flatten(self):
        return (self.rows, self.cols, self.data), (
            self.nb, self.Eb, self.r_local, self.n)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.rows, obj.cols, obj.data = children
        obj.nb, obj.Eb, obj.r_local, obj.n = aux
        return obj


def shard_vector(x, mesh: Mesh, axis: str = "rows"):
    """Column-shard a dense vector into (D, nb) blocks over `mesh[axis]`
    (zero-padded to D*nb) — per-device footprint O(n/D), the operand
    layout of `spmv_sharded_streamed`."""
    D = mesh.shape[axis]
    n = int(x.shape[0])
    nb = -(-n // D)
    xp = jnp.pad(jnp.asarray(x), (0, D * nb - n))
    return jax.device_put(xp.reshape(D, nb), NamedSharding(mesh, P(axis)))


def spmv_stream_plan(a: ShardedCSR, mesh: Mesh,
                     axis: str = "rows") -> SpmvStreamPlan:
    """Group each shard's entries by x column-block (host-side, once per
    structure — the analysis phase of the streaming SpMV).  Within a
    block, entries keep their CSR order, so each (row, block) partial is
    a fixed chain independent of how blocks later arrive."""
    D = mesh.shape[axis]
    n = a.shape[1]
    nb = -(-n // D)
    r_local = a.rows_per_shard
    E = int(a.indices.shape[1])
    ix_h = np.asarray(a.indices)
    dv_h = np.asarray(a.data)
    ip_h = np.asarray(a.indptr)
    nz_h = np.asarray(a.nnz_local)
    # per-(device, block) entry counts -> Eb
    counts = np.zeros((D, D), np.int64)
    for i in range(D):
        blk = ix_h[i, :nz_h[i]] // nb
        counts[i] = np.bincount(blk, minlength=D)
    Eb = max(1, int(counts.max()))
    rows_s = np.full((D, D * Eb), r_local, np.int32)  # drop segment
    cols_s = np.zeros((D, D * Eb), np.int32)
    data_s = np.zeros((D, D * Eb), dv_h.dtype)
    for i in range(D):
        nz = int(nz_h[i])
        rows_i = np.repeat(np.arange(r_local, dtype=np.int32),
                           np.diff(ip_h[i]))[:nz]
        blk = ix_h[i, :nz] // nb
        order = np.argsort(blk, kind="stable")  # keeps CSR order in-block
        off = np.zeros(D + 1, np.int64)
        np.cumsum(counts[i], out=off[1:])
        pos = np.arange(nz) - off[blk[order]] + blk[order] * Eb
        rows_s[i, pos] = rows_i[order]
        cols_s[i, pos] = ix_h[i, order] - blk[order] * nb
        data_s[i, pos] = dv_h[i, order]
    sharding = NamedSharding(mesh, P(axis))
    return SpmvStreamPlan(
        jax.device_put(jnp.asarray(rows_s), sharding),
        jax.device_put(jnp.asarray(cols_s), sharding),
        jax.device_put(jnp.asarray(data_s), sharding),
        nb, Eb, r_local, n)


def _spmv_block_partial(rows_sl, cols_sl, data_sl, x_blk, r_local: int):
    """One (device, block) partial: gather from the local x block and
    segment-sum; padding rows land in the drop segment."""
    prod = data_sl * x_blk[cols_sl]
    return jax.ops.segment_sum(prod, rows_sl, num_segments=r_local + 1,
                               indices_are_sorted=False)[:r_local]


def spmv_sharded_streamed(a_or_plan, x_blocks, mesh: Mesh,
                          axis: str = "rows"):
    """y = A @ x with A row-sharded AND x column-sharded: per-device x
    footprint is O(n/D) (VERDICT r3 missing-2; the reference's sparse
    communicator moves operand pieces, _nccl_comm.py:525-580).

    x blocks rotate through a `ppermute` ring (the B-ring pattern of
    `spgemm_sharded_sparse`); each arriving block multiplies the entries
    pre-grouped for it at plan time, transfers overlapping compute.

    Reduction tree: blocks arrive in descending order within two runs
    (my..0 then D-1..my+1), and each run is folded on the fly into its
    own accumulator (a right-fold), y = accLow + accHigh.  The tree is
    fixed per output row (my is the row's home device), so results are
    run-to-run deterministic and bitwise-equal to
    `spmv_sharded_blocked`, the replicated-x twin that replays the
    identical fold without communication.  The two-accumulator form
    keeps the loop carry O(n/D); the previous ascending fold buffered
    all D per-block partials — an O(m) term that defeated the O(1/D)
    footprint contract this path exists for.
    """
    plan = (a_or_plan if isinstance(a_or_plan, SpmvStreamPlan)
            else spmv_stream_plan(a_or_plan, mesh, axis))
    D = mesh.shape[axis]
    r_local, Eb, nb = plan.r_local, plan.Eb, plan.nb
    perm = tuple((i, (i + 1) % D) for i in range(D))

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis))
        def ring(rows_b, cols_b, data_b, x_b):
            my = jax.lax.axis_index(axis).astype(INDEX_DTYPE)

            def step(s, carry):
                xb, acc_low, acc_high = carry
                blk = jnp.mod(my - s, D)
                sl = (blk * Eb).astype(INDEX_DTYPE)
                part = _spmv_block_partial(
                    jax.lax.dynamic_slice(rows_b[0], (sl,), (Eb,)),
                    jax.lax.dynamic_slice(cols_b[0], (sl,), (Eb,)),
                    jax.lax.dynamic_slice(data_b[0], (sl,), (Eb,)),
                    xb, r_local)
                # blocks ≤ my arrive first (descending), then > my:
                # right-fold each run into its own accumulator
                low = blk <= my
                acc_low = jnp.where(low, part + acc_low, acc_low)
                acc_high = jnp.where(low, acc_high, part + acc_high)
                xb = jax.lax.ppermute(xb, axis, perm)
                return (xb, acc_low, acc_high)

            def vary(v):
                return jax.lax.pcast(v, (axis,), to="varying")
            zero = vary(jnp.zeros((r_local,), data_b.dtype))
            init = (x_b[0], zero, zero)
            _, acc_low, acc_high = jax.lax.fori_loop(
                jnp.asarray(0, INDEX_DTYPE), jnp.asarray(D, INDEX_DTYPE),
                step, init)
            return (acc_low + acc_high)[None]

        return ring

    prog = _cached_program(
        ("spmv_stream", mesh, axis, D, r_local, Eb, nb), build)
    return prog(plan.rows, plan.cols, plan.data, x_blocks)


def spmv_sharded_blocked(a_or_plan, x, mesh: Mesh, axis: str = "rows"):
    """Replicated-x twin of `spmv_sharded_streamed`: identical per-block
    partials folded through the identical two-accumulator split
    right-fold (blocks my..0 into acc_low, D-1..my+1 into acc_high,
    y = acc_low + acc_high), x sliced locally instead of
    ring-transferred — the bitwise cross-check for the streamed path
    (and the fallback when x is already replicated)."""
    plan = (a_or_plan if isinstance(a_or_plan, SpmvStreamPlan)
            else spmv_stream_plan(a_or_plan, mesh, axis))
    D = mesh.shape[axis]
    r_local, Eb, nb = plan.r_local, plan.Eb, plan.nb

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(axis))
        def step(rows_b, cols_b, data_b, x_full):
            my = jax.lax.axis_index(axis).astype(INDEX_DTYPE)
            xp = jnp.pad(x_full, (0, D * nb - x_full.shape[0]))

            def fold(s, carry):
                acc_low, acc_high = carry
                blk = jnp.mod(my - s, D)
                part = _spmv_block_partial(
                    jax.lax.dynamic_slice(rows_b[0], (blk * Eb,), (Eb,)),
                    jax.lax.dynamic_slice(cols_b[0], (blk * Eb,), (Eb,)),
                    jax.lax.dynamic_slice(data_b[0], (blk * Eb,), (Eb,)),
                    jax.lax.dynamic_slice(xp, (blk * nb,), (nb,)),
                    r_local)
                low = blk <= my
                acc_low = jnp.where(low, part + acc_low, acc_low)
                acc_high = jnp.where(low, acc_high, part + acc_high)
                return (acc_low, acc_high)

            zero = jax.lax.pcast(jnp.zeros((r_local,), data_b.dtype),
                                 (axis,), to="varying")
            acc_low, acc_high = jax.lax.fori_loop(
                jnp.asarray(0, INDEX_DTYPE), jnp.asarray(D, INDEX_DTYPE),
                fold, (zero, zero))
            return (acc_low + acc_high)[None]

        return step

    prog = _cached_program(
        ("spmv_blocked", mesh, axis, D, r_local, Eb, nb), build)
    return prog(plan.rows, plan.cols, plan.data, x)


def spmm_sharded(a: ShardedCSR, b, mesh: Mesh, axis: str = "rows"):
    """C = A @ B with A row-sharded, B (dense) replicated; C row-sharded."""

    def _local_spmm(indptr, indices, data, b_full):
        E = data.shape[0]
        m_local = indptr.shape[0] - 1
        rows = _local_rows(indptr, E)
        gathered = b_full[indices, :] * data[:, None]
        return jax.ops.segment_sum(gathered, rows, num_segments=m_local,
                                   indices_are_sorted=True)

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(axis))
        def step(indptr_blk, indices_blk, data_blk, b_full):
            return jax.vmap(
                lambda ip, ix, dv: _local_spmm(ip, ix, dv, b_full)
            )(indptr_blk, indices_blk, data_blk)

        return step

    prog = _cached_program(("spmm", mesh, axis), build)
    return prog(a.indptr, a.indices, a.data, b)


def spmv_t_sharded(a: ShardedCSR, y, mesh: Mesh, axis: str = "rows"):
    """x = A.T @ y with A row-sharded and y row-sharded: each shard
    scatter-adds its contribution over the full column space, then a psum
    over the mesh reduces partials — the all-to-all-of-partials pattern."""
    n = a.shape[1]

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P())
        def step(indptr_blk, indices_blk, data_blk, y_blk):
            def one(ip, ix, dv, yv):
                E = dv.shape[0]
                rows = _local_rows(ip, E)
                m_local = ip.shape[0] - 1
                contrib = dv * yv[jnp.minimum(rows, m_local - 1)]
                return jax.ops.segment_sum(contrib, ix, num_segments=n)

            partial = jax.vmap(one)(indptr_blk, indices_blk, data_blk,
                                    y_blk).sum(axis=0)
            return jax.lax.psum(partial, axis)

        return step

    prog = _cached_program(("spmv_t", mesh, axis, n), build)
    return prog(a.indptr, a.indices, a.data, y)


def spgemm_dense_sharded(a: ShardedCSR, b_dense, mesh: Mesh,
                         axis: str = "rows"):
    """Row-sharded SpGEMM via the ALG1 dense-intermediate: each shard
    densifies its row block and multiplies the replicated dense B on the
    MXU.  Returns the dense product, row-sharded (compression to CSR is a
    host-side gather via `unshard_rows`)."""

    def _local(indptr, indices, data, b_full):
        E = data.shape[0]
        m_local = indptr.shape[0] - 1
        rows = _local_rows(indptr, E)
        k = b_full.shape[0]
        a_dense = jnp.zeros((m_local * k,), data.dtype)
        flat = rows * jnp.asarray(k, INDEX_DTYPE) + indices
        a_dense = a_dense.at[flat].add(data, mode="drop").reshape(
            m_local, k)
        return jnp.dot(a_dense, b_full, preferred_element_type=data.dtype,
                       precision=jax.lax.Precision.HIGHEST)

    def build():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P()),
            out_specs=P(axis))
        def step(indptr_blk, indices_blk, data_blk, b_full):
            return jax.vmap(
                lambda ip, ix, dv: _local(ip, ix, dv, b_full)
            )(indptr_blk, indices_blk, data_blk)

        return step

    prog = _cached_program(("spgemm_dense", mesh, axis), build)
    return prog(a.indptr, a.indices, a.data, b_dense)


# ---------------------------------------------------------------------------
# sparse-in / sparse-out distributed SpGEMM
# ---------------------------------------------------------------------------


def _densify_gathered_b(ip_g, ix_g, dv_g, nz_g, row_starts, k: int, n: int):
    """Dense (k, n) from all-gathered padded B row-blocks (local compute,
    runs inside shard_map on every device)."""
    D = ip_g.shape[0]
    E = ix_g.shape[1]

    def one(ip, ix, dv, nz, r0):
        rows = _local_rows(ip, E) + r0
        valid = jnp.arange(E, dtype=INDEX_DTYPE) < nz
        flat = jnp.where(valid, rows * jnp.asarray(n, INDEX_DTYPE) + ix,
                         k * n)
        return jnp.zeros((k * n + 1,), dv.dtype).at[flat].add(
            jnp.where(valid, dv, 0), mode="drop")[:k * n]

    parts = jax.vmap(one)(ip_g, ix_g, dv_g, nz_g, row_starts)
    return parts.sum(axis=0).reshape(k, n)


def spgemm_sharded_sparse(a: ShardedCSR, b: ShardedCSR, mesh: Mesh,
                          axis: str = "rows",
                          precision: str = "highest",
                          stream_b: bool = True):
    """C = A @ B, sparse in, sparse out, C row-sharded like A.

    A is row-sharded; B stays row-sharded too and its blocks rotate
    around the mesh axis in a `ppermute` ring (`stream_b=True`, the
    default): each device densifies ONE (k/D, n) block per ring step and
    accumulates its C panel — per-device peak is O(k·n/D + m·k/D + m·n/D)
    instead of the O(k·n) full-B densification (see
    `utils.memory_model.spgemm_sharded_peak_bytes`).  This is the
    TPU-native form of the reference sparse communicator's p2p operand
    movement (/root/reference
    modify_src/cupy-src/cupyx/distributed/_nccl_comm.py:525-580) and the
    survey's prescribed ppermute ring of B row-blocks (SURVEY.md §7 L4).

    `stream_b=False` keeps the round-2 path: all-gather B's blocks and
    densify the full (k, n) B on every device.  Both paths produce the
    exact same structure (counts are exact integer dots either way); the
    streamed numeric values accumulate K-block partial products in ring
    order (fixed, deterministic) rather than one full-K dot, so data may
    differ from the replicated path by f32 rounding only.

    Each shard extracts its block of C to a static per-shard capacity
    (sized by one counts readback — the distributed spMatGetSize).
    Nothing about C is ever unsharded.  Reference capability:
    sparse-in/sparse-out end-to-end (cusparse.py:2007-2142).
    """
    if stream_b:
        return _spgemm_sharded_sparse_streamed(a, b, mesh, axis, precision)
    return _spgemm_sharded_sparse_replicated(a, b, mesh, axis, precision)


def _spgemm_sharded_sparse_replicated(a: ShardedCSR, b: ShardedCSR,
                                      mesh: Mesh, axis: str,
                                      precision: str):
    from spmm_tpu.parallel.collectives import all_gather_csr_blocks

    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    b_row_starts = jnp.asarray(b.row_bounds[:-1], INDEX_DTYPE)
    ip_g, ix_g, dv_g, nz_g = all_gather_csr_blocks(b, mesh, axis)
    r_local = a.rows_per_shard

    def _local_dense(ip, ix, dv, nz, b_dense):
        E = dv.shape[0]
        rows = _local_rows(ip, E)
        valid = jnp.arange(E, dtype=INDEX_DTYPE) < nz
        # padding slots scatter out of range (dropped) so they cannot
        # pollute the structural pattern
        flat = jnp.where(valid, rows * jnp.asarray(k, INDEX_DTYPE) + ix,
                         r_local * k)
        ad = jnp.zeros((r_local * k + 1,), dv.dtype).at[flat].add(
            jnp.where(valid, dv, 0), mode="drop")[:r_local * k].reshape(
            r_local, k)
        apat = jnp.zeros((r_local * k + 1,), jnp.float32).at[flat].add(
            1.0, mode="drop")[:r_local * k].reshape(r_local, k)
        apat = (apat > 0).astype(jnp.bfloat16)
        bpat = (b_dense != 0).astype(jnp.bfloat16)
        ct = jnp.dot(ad, b_dense, precision=prec,
                     preferred_element_type=dv.dtype)
        counts = jnp.dot(apat, bpat, preferred_element_type=jnp.float32)
        return ct, counts

    def build_count():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis),
                      P(), P(), P(), P(), P()),
            out_specs=P(axis))
        def count(ip_b, ix_b, dv_b, nz_b, ipg, ixg, dvg, nzg, rstarts):
            b_dense = _densify_gathered_b(ipg, ixg, dvg, nzg, rstarts,
                                          k, n)
            _, counts = _local_dense(ip_b[0], ix_b[0], dv_b[0], nz_b[0],
                                     b_dense)
            return jnp.sum(counts > 0, dtype=INDEX_DTYPE)[None]

        return count

    prog_c = _cached_program(
        ("spgemm_sp_count", mesh, axis, a.shape, b.shape, precision),
        build_count)
    counts_d = prog_c(a.indptr, a.indices, a.data, a.nnz_local,
                      ip_g, ix_g, dv_g, nz_g, b_row_starts)
    counts_h = np.asarray(counts_d)  # the distributed spMatGetSize
    cap = max(int(counts_h.max()), 1)

    def build_compute(cap=cap):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis),
                      P(), P(), P(), P(), P()),
            out_specs=(P(axis), P(axis), P(axis), P(axis)))
        def compute(ip_b, ix_b, dv_b, nz_b, ipg, ixg, dvg, nzg, rstarts):
            b_dense = _densify_gathered_b(ipg, ixg, dvg, nzg, rstarts,
                                          k, n)
            ct, counts = _local_dense(ip_b[0], ix_b[0], dv_b[0], nz_b[0],
                                      b_dense)
            indptr_l, cols, vals, nnz_l = _extract_csr_block(
                ct, counts, cap, n, r_local)
            return (indptr_l[None], cols[None], vals[None], nnz_l[None])

        return compute

    prog = _cached_program(
        ("spgemm_sp_compute", mesh, axis, a.shape, b.shape, cap,
         precision), build_compute)
    ip_o, ix_o, dv_o, nz_o = prog(a.indptr, a.indices, a.data,
                                  a.nnz_local, ip_g, ix_g, dv_g, nz_g,
                                  b_row_starts)
    return ShardedCSR(ip_o, ix_o, dv_o, nz_o, (m, n), a.row_bounds)


def _extract_csr_block(ct, counts, cap: int, n: int, r_local: int):
    """Compress a dense (r_local, n) product panel to CSR components with
    static capacity `cap` (the stable-sort compaction used by every
    fixed-capacity extraction in this repo)."""
    mask = (counts > 0).ravel()
    nnz_l = jnp.sum(mask, dtype=INDEX_DTYPE)
    keys = jnp.where(mask, jnp.int8(0), jnp.int8(1))
    idx = jnp.arange(r_local * n, dtype=INDEX_DTYPE)
    _, flat_s, val_s = jax.lax.sort(
        (keys, idx, ct.ravel()), num_keys=1, is_stable=True)
    flat_c = flat_s[:cap]
    valid = jnp.arange(cap, dtype=INDEX_DTYPE) < nnz_l
    cols = jnp.where(valid, flat_c % jnp.asarray(n, INDEX_DTYPE), 0)
    vals = jnp.where(valid, val_s[:cap], 0)
    rowc = jnp.sum(counts > 0, axis=1, dtype=INDEX_DTYPE)
    indptr_l = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE),
         jnp.cumsum(rowc, dtype=INDEX_DTYPE)])
    return indptr_l, cols, vals, nnz_l


def _spgemm_sharded_sparse_streamed(a: ShardedCSR, b: ShardedCSR,
                                    mesh: Mesh, axis: str,
                                    precision: str):
    """B-streaming ring SpGEMM: see `spgemm_sharded_sparse`.  One ring
    program produces the dense C panel + structural counts (B blocks
    rotate via ppermute; one (k/D, n) block densified per step), a
    one-scalar-per-shard readback sizes the output (the distributed
    spMatGetSize), and a local extraction program compresses panels to
    row-sharded CSR."""
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    D = mesh.shape[axis]
    r_local = a.rows_per_shard
    rb = b.rows_per_shard
    Eb = int(b.indices.shape[1])
    Ea = int(a.indices.shape[1])
    k_pad = k + rb  # column head-room: the ring's dynamic column slice
    #                 at the last block start never clips
    b_row_starts = jnp.asarray(b.row_bounds[:-1], INDEX_DTYPE)
    perm = tuple((i, (i + 1) % D) for i in range(D))

    def build_ring():
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis),
                      P(axis), P(axis), P(axis), P(axis), P()),
            out_specs=(P(axis), P(axis), P(axis)))
        def ring(ip_a, ix_a, dv_a, nz_a, ip_b, ix_b, dv_b, nz_b, rstarts):
            # densify this shard's A rows once, with k_pad columns
            rows_a = _local_rows(ip_a[0], Ea)
            valid_a = jnp.arange(Ea, dtype=INDEX_DTYPE) < nz_a[0]
            flat_a = jnp.where(
                valid_a,
                rows_a * jnp.asarray(k_pad, INDEX_DTYPE) + ix_a[0],
                r_local * k_pad)
            ad = jnp.zeros((r_local * k_pad + 1,), dv_a.dtype).at[
                flat_a].add(jnp.where(valid_a, dv_a[0], 0),
                            mode="drop")[:r_local * k_pad].reshape(
                r_local, k_pad)
            apat = jnp.zeros((r_local * k_pad + 1,), jnp.float32).at[
                flat_a].add(1.0, mode="drop")[:r_local * k_pad].reshape(
                r_local, k_pad)
            apat = (apat > 0).astype(jnp.bfloat16)
            my = jax.lax.axis_index(axis).astype(INDEX_DTYPE)

            def step(s, carry):
                ipb, ixb, dvb, nzb, ct, counts = carry
                # after s hops along the (i -> i+1) ring, this device
                # holds block (my - s) mod D
                blk = jnp.mod(my - s, D)
                r0 = rstarts[blk]
                rows_b = _local_rows(ipb, Eb)
                valid_b = jnp.arange(Eb, dtype=INDEX_DTYPE) < nzb
                flat_b = jnp.where(
                    valid_b,
                    rows_b * jnp.asarray(n, INDEX_DTYPE) + ixb,
                    rb * n)
                bd = jnp.zeros((rb * n + 1,), dvb.dtype).at[flat_b].add(
                    jnp.where(valid_b, dvb, 0),
                    mode="drop")[:rb * n].reshape(rb, n)
                bpat = (bd != 0).astype(jnp.bfloat16)
                a_sl = jax.lax.dynamic_slice(ad, (0, r0), (r_local, rb))
                ap_sl = jax.lax.dynamic_slice(apat, (0, r0),
                                              (r_local, rb))
                counts = counts + jnp.dot(
                    ap_sl, bpat, preferred_element_type=jnp.float32)
                ct = ct + jnp.dot(a_sl, bd, precision=prec,
                                  preferred_element_type=dvb.dtype)
                ipb, ixb, dvb, nzb = (
                    jax.lax.ppermute(c, axis, perm)
                    for c in (ipb, ixb, dvb, nzb))
                return (ipb, ixb, dvb, nzb, ct, counts)

            def vary(v):
                return jax.lax.pcast(v, (axis,), to="varying")
            init = (ip_b[0], ix_b[0], dv_b[0], nz_b[0],
                    vary(jnp.zeros((r_local, n), dv_a.dtype)),
                    vary(jnp.zeros((r_local, n), jnp.float32)))
            *_, ct, counts = jax.lax.fori_loop(
                jnp.asarray(0, INDEX_DTYPE), jnp.asarray(D, INDEX_DTYPE),
                step, init)
            nnz_l = jnp.sum(counts > 0, dtype=INDEX_DTYPE)
            return ct[None], counts[None], nnz_l[None]

        return ring

    prog_r = _cached_program(
        ("spgemm_sp_stream_ring", mesh, axis, a.shape, b.shape,
         precision, r_local, rb, Ea, Eb), build_ring)
    ct_d, counts_d, nnz_d = prog_r(a.indptr, a.indices, a.data,
                                   a.nnz_local, b.indptr, b.indices,
                                   b.data, b.nnz_local, b_row_starts)
    cap = max(int(np.asarray(nnz_d).max()), 1)  # distributed spMatGetSize

    def build_extract(cap=cap):
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)))
        def extract(ct_b, counts_b):
            ip_l, cols, vals, nnz_l = _extract_csr_block(
                ct_b[0], counts_b[0], cap, n, r_local)
            return ip_l[None], cols[None], vals[None], nnz_l[None]

        return extract

    prog_e = _cached_program(
        ("spgemm_sp_stream_extract", mesh, axis, a.shape, b.shape, cap),
        build_extract)
    ip_o, ix_o, dv_o, nz_o = prog_e(ct_d, counts_d)
    return ShardedCSR(ip_o, ix_o, dv_o, nz_o, (m, n), a.row_bounds)


def sharded_to_csr(c: ShardedCSR) -> CSR:
    """Gather a ShardedCSR into a single-host CSR (test/inspection path —
    the `gather` of the sparse communicator)."""
    D = c.n_shards
    ip = np.asarray(c.indptr)
    ix = np.asarray(c.indices)
    dv = np.asarray(c.data)
    nz = np.asarray(c.nnz_local)
    indptr = [np.zeros(1, np.int32)]
    cols = []
    vals = []
    base = 0
    for i in range(D):
        r0, r1 = c.row_bounds[i], c.row_bounds[i + 1]
        indptr.append(ip[i, 1:r1 - r0 + 1] + base)
        cols.append(ix[i, : nz[i]])
        vals.append(dv[i, : nz[i]])
        base += int(nz[i])
    return CSR.from_parts(
        jnp.asarray(np.concatenate(indptr), jnp.int32),
        jnp.asarray(np.concatenate(cols) if cols else np.zeros(0, np.int32)),
        jnp.asarray(np.concatenate(vals) if vals else
                    np.zeros(0, np.float32)),
        c.shape, canonical=True)
