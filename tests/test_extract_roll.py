"""extract_roll (Pallas rolled extraction) vs the _extract_shift select
chain: bit-identical outputs, including beyond the select chain's
128-hole ceiling."""

import numpy as np
import pytest

import jax.numpy as jnp

import spmm_tpu as st  # noqa: F401  (forces CPU config via conftest)
from spmm_tpu.ops.kernels.extract_roll import extract_roll, _pick_b
import importlib

sg = importlib.import_module("spmm_tpu.ops.spgemm")


def _case(m, n, g, seed):
    rng = np.random.default_rng(seed)
    mask = np.ones((m, n), bool)
    if g:
        holes = rng.choice(m * n, size=g, replace=False)
        mask.ravel()[holes] = False
    c = rng.standard_normal((m, n)).astype(np.float32) * mask
    return jnp.asarray(c), jnp.asarray(mask), int(mask.sum())


@pytest.mark.parametrize("m,n,g", [
    (32, 128, 5),
    (64, 256, 33),     # the headline-shaped hole count
    (16, 128, 0),
    (40, 128, 200),    # beyond _SHIFT_EXTRACT_MAX_HOLES
    (8, 128, 1000),
])
def test_extract_roll_bitwise_vs_shift(m, n, g):
    c, mask, cap = _case(m, n, g, seed=g + 1)
    g_pad = max(8, -(-max(g, 1) // 8) * 8)
    ip1, col1, v1 = sg._extract_shift(c, mask, cap, g_pad, m, n)
    ip2, col2, v2 = extract_roll(c, mask, cap, g_pad, m, n,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(ip1), np.asarray(ip2))
    np.testing.assert_array_equal(np.asarray(col1), np.asarray(col2))
    assert np.array_equal(np.asarray(v1).view(np.uint32),
                          np.asarray(v2).view(np.uint32))


def test_extract_roll_scipy_parity():
    from scipy import sparse as sp

    c, mask, cap = _case(48, 256, 77, seed=9)
    g_pad = 80
    ip, col, v = extract_roll(c, mask, cap, g_pad, 48, 256,
                              interpret=True)
    ref = sp.csr_matrix(np.asarray(c) * np.asarray(mask))
    ref.sort_indices()
    np.testing.assert_array_equal(np.asarray(ip), ref.indptr)
    np.testing.assert_array_equal(np.asarray(col), ref.indices)
    np.testing.assert_array_equal(np.asarray(v), ref.data)


def test_pick_b_small_caps():
    assert _pick_b(100) == 16
    assert _pick_b(512 * 128) == 512
    assert _pick_b(10**7) == 512
