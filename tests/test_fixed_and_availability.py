"""Tests for the serving-path fixed-capacity SpGEMM and availability table."""

import jax.numpy as jnp
import numpy as np
import pytest

import spmm_tpu as st
from spmm_tpu.ops import check_availability, has_fast_path, spgemm_fixed
from helpers import make_pair


def test_spgemm_fixed_exact_cap():
    A, B, As, Bs = make_pair(48, 40, 44, 0.2, 0.2)
    C, nnz = spgemm_fixed(A, B)
    ref = (As @ Bs).tocsr()
    ref.sort_indices()
    assert int(nnz) == ref.nnz
    np.testing.assert_array_equal(np.asarray(C.indptr), ref.indptr)
    np.testing.assert_array_equal(np.asarray(C.indices)[:ref.nnz],
                                  ref.indices)
    np.testing.assert_allclose(np.asarray(C.data)[:ref.nnz], ref.data,
                               rtol=2e-5, atol=1e-6)


def test_spgemm_fixed_oversized_cap():
    A, B, As, Bs = make_pair(30, 25, 28, 0.25, 0.25)
    ref = (As @ Bs).tocsr()
    cap = ref.nnz + 37
    C, nnz = spgemm_fixed(A, B, cap=cap)
    assert C.data.shape[0] == cap
    assert int(nnz) == ref.nnz
    # padding region is zeroed
    np.testing.assert_array_equal(np.asarray(C.data)[ref.nnz:], 0)
    np.testing.assert_array_equal(np.asarray(C.indices)[ref.nnz:], 0)
    ref.sort_indices()
    np.testing.assert_allclose(np.asarray(C.data)[:ref.nnz], ref.data,
                               rtol=2e-5, atol=1e-6)


def test_spgemm_fixed_alpha():
    A, B, As, Bs = make_pair(20, 20, 20, 0.3, 0.3)
    C, nnz = spgemm_fixed(A, B, alpha=3.0)
    ref = (3.0 * (As @ Bs)).tocsr()
    ref.sort_indices()
    np.testing.assert_allclose(np.asarray(C.data)[:ref.nnz], ref.data,
                               rtol=2e-5, atol=1e-5)


def test_availability_table():
    assert check_availability("spgemm")
    assert check_availability("spmv", backend="tpu")
    assert not check_availability("csrmv")  # legacy, gone on CUDA≥11 too
    assert has_fast_path("spgemm", backend="tpu")
    assert not has_fast_path("csrsort", backend="tpu")
    with pytest.raises(KeyError):
        check_availability("nonsense")


def test_spgemm_fixed_cap_exceeding_dense_size():
    """cap larger than m*n (regression: negative hole count crashed the
    shift-extraction path)."""
    A, B, As, Bs = make_pair(30, 40, 30, 0.2, 0.2)
    cap = 30 * 30 + 500
    C, nnz = spgemm_fixed(A, B, cap=cap, precision="high")
    ref = (As @ Bs).tocsr()
    ref.sort_indices()
    assert C.data.shape[0] == cap
    assert int(nnz) == ref.nnz
    np.testing.assert_allclose(np.asarray(C.data)[:ref.nnz], ref.data,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(C.data)[ref.nnz:], 0)
