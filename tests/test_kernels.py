"""Pallas kernel tests (interpret mode on CPU; compiled on real TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from spmm_tpu.ops.kernels.bsr_spmm import spmm_bsr_pallas

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("blocksize", [(8, 128), (16, 128)])
def test_bsr_spmm_pallas_parity(blocksize):
    A = st.random(64, 256, density=0.05, format="csr", random_state=0)
    As = A.to_scipy()
    Ab = A.tobsr(blocksize=blocksize)
    B = np.random.default_rng(1).random((256, 128), dtype=np.float32)
    got = spmm_bsr_pallas(Ab, jnp.asarray(B), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), As @ B, rtol=1e-4,
                               atol=1e-5)


def test_bsr_spmm_pallas_ragged_shapes():
    # K, N not multiples of the block/tile — wrapper pads
    A = st.random(40, 200, density=0.1, format="csr", random_state=2)
    As = A.to_scipy()
    Ab = A.tobsr(blocksize=(8, 128))
    B = np.random.default_rng(3).random((200, 70), dtype=np.float32)
    got = spmm_bsr_pallas(Ab, jnp.asarray(B), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), As @ B, rtol=1e-4,
                               atol=1e-5)


def test_bsr_spmm_pallas_empty():
    A = st.CSR((16, 256), dtype=jnp.float32)
    Ab = A.tobsr(blocksize=(8, 128))
    B = jnp.ones((256, 128), jnp.float32)
    got = spmm_bsr_pallas(Ab, B, interpret=INTERPRET)
    assert got.shape == (16, 128)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_bsr_spmm_pallas_block_structured():
    from spmm_tpu.models import block_sparse

    A = block_sparse(128, 512, block=(8, 128), block_density=0.3, seed=4)
    As = A.to_scipy()
    Ab = A.tobsr(blocksize=(8, 128))
    B = np.random.default_rng(5).random((512, 256), dtype=np.float32)
    got = spmm_bsr_pallas(Ab, jnp.asarray(B), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), As @ B, rtol=1e-4,
                               atol=1e-4)
