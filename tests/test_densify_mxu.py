"""Tests for the one-hot MXU densify kernel (interpret on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from spmm_tpu.ops.kernels.densify_mxu import csr_densify_mxu

INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("shape,d", [((100, 130), 0.15), ((300, 257), 0.05),
                                     ((64, 64), 0.5), ((128, 1024), 0.01)])
def test_densify_mxu_parity(shape, d):
    m, k = shape
    A = st.random(m, k, d, format="csr", random_state=0)
    got = csr_densify_mxu(A.indptr, A.indices, A.data, m, k,
                          interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got),
                                  A.to_scipy().toarray())


def test_densify_mxu_empty():
    A = st.CSR((16, 32), dtype=jnp.float32)
    got = csr_densify_mxu(A.indptr, A.indices, A.data, 16, 32,
                          interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got), 0)


def test_densify_mxu_skewed_rows():
    from spmm_tpu.models import power_law_rows

    A = power_law_rows(200, 300, avg_nnz_per_row=20, seed=3)
    got = csr_densify_mxu(A.indptr, A.indices, A.data, 200, 300,
                          interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(got),
                                  A.to_scipy().toarray())
