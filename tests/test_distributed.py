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
