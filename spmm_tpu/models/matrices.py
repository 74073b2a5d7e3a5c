"""Synthetic sparse-matrix families ("models") used by benchmarks and tests.

The reference generates only uniform-random matrices
(scipy/cupyx `sp.random`, e.g. SpGEMM_alg_comparison/profiler.py:146-152);
the TPU build adds structured families because blocked/banded structure is
what the (8,128)-tiled BSR path exists for.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.sparse import construct
from spmm_tpu.sparse.coo import COO

INDEX_DTYPE = jnp.int32


def uniform(m: int, n: int, density: float, seed: int = 0,
            dtype=jnp.float32, format: str = "csr", low=0.0, high=1.0):
    """Uniform-random positions, U[low, high) values — the reference's
    generator (`_construct.py:321-374` with default data_rvs)."""
    if (low, high) == (0.0, 1.0):
        return construct.random(m, n, density, format=format, dtype=dtype,
                                random_state=seed)
    return construct.random(
        m, n, density, format=format, dtype=dtype, random_state=seed,
        data_rvs=lambda key, shape, dt: jax.random.uniform(
            key, shape, dt, minval=low, maxval=high))


def banded(m: int, n: int, bandwidth: int, seed: int = 0,
           dtype=jnp.float32, format: str = "csr"):
    """Dense band of half-width `bandwidth` around the diagonal."""
    offsets = list(range(-bandwidth, bandwidth + 1))
    key = jax.random.PRNGKey(seed)
    diagonals = []
    for i, k in enumerate(offsets):
        size = max(0, min(m + min(k, 0), n - max(k, 0)))
        diagonals.append(jax.random.uniform(
            jax.random.fold_in(key, i), (size,), dtype))
    return construct.diags(diagonals, offsets, shape=(m, n), format=format)


def block_sparse(m: int, n: int, block: Tuple[int, int],
                 block_density: float, seed: int = 0, dtype=jnp.float32,
                 format: str = "csr"):
    """Dense (R, C) blocks placed uniformly at random — the BSR-friendly
    family (each stored block is a full MXU/VPU tile)."""
    R, C = block
    mb, nb = m // R, n // C
    key = jax.random.PRNGKey(seed)
    kpos, kval = jax.random.split(key)
    nblocks = max(1, int(block_density * mb * nb))
    flat = jax.random.choice(kpos, mb * nb, shape=(nblocks,), replace=False)
    brow = (flat // nb).astype(INDEX_DTYPE)
    bcol = (flat % nb).astype(INDEX_DTYPE)
    vals = jax.random.uniform(kval, (nblocks, R, C), dtype)
    rr = jnp.repeat(brow, R * C) * R + jnp.tile(
        jnp.repeat(jnp.arange(R, dtype=INDEX_DTYPE), C), nblocks)
    cc = jnp.repeat(bcol, R * C) * C + jnp.tile(
        jnp.arange(C, dtype=INDEX_DTYPE), nblocks * R)
    coo = COO.from_parts(rr, cc, vals.reshape(-1), (m, n))
    return coo.asformat(format)


def power_law_rows(m: int, n: int, avg_nnz_per_row: int, alpha: float = 1.5,
                   seed: int = 0, dtype=jnp.float32, format: str = "csr"):
    """Skewed row lengths (Zipf-like) — the load-imbalance stress family
    for chunked SpGEMM and row-sharded distribution."""
    rng = np.random.default_rng(seed)
    raw = rng.zipf(alpha, size=m).astype(np.float64)
    lengths = np.minimum(
        np.maximum((raw / raw.mean() * avg_nnz_per_row).astype(np.int64), 0),
        n)
    rows = np.repeat(np.arange(m), lengths)
    cols = np.concatenate([
        rng.choice(n, size=int(l), replace=False) for l in lengths
    ]) if lengths.sum() else np.zeros((0,), np.int64)
    vals = rng.random(rows.shape[0]).astype(np.float32)
    coo = COO.from_parts(jnp.asarray(rows, INDEX_DTYPE),
                         jnp.asarray(cols, INDEX_DTYPE),
                         jnp.asarray(vals, dtype), (m, n))
    return coo.asformat(format)


FAMILIES = {
    "uniform": uniform,
    "banded": banded,
    "block": block_sparse,
    "powerlaw": power_law_rows,
}
