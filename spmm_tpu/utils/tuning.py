"""Break-even calibration: measure the dense/sparse crossover on the current
device and produce a dispatch table.

The reference *measures* its break-even curve (dense_vs_sparseGEMM) but its
dispatch is manual; here the measurement feeds `ops.dispatch` directly.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

_DEFAULT_CACHE = os.path.join(os.path.dirname(__file__), "..", "..",
                              ".break_even.json")


def _median_ms(fn, args=(), runs: int = 5, batch: int = 5) -> float:
    import statistics

    jax.block_until_ready(fn(*args))
    meds = []
    for _ in range(runs):
        t0 = time.perf_counter()
        rs = [fn(*args) for _ in range(batch)]
        jax.block_until_ready(rs)
        meds.append((time.perf_counter() - t0) * 1e3 / batch)
    return statistics.median(meds)


def calibrate_break_even(sizes: Sequence[int] = (1024, 2048, 4096, 8192),
                         densities: Sequence[float] = (
                             0.001, 0.003, 0.01, 0.03, 0.1),
                         save_path: Optional[str] = _DEFAULT_CACHE,
                         verbose: bool = True) -> Dict[int, float]:
    """For each size, find the lowest density at which the dense MXU SpMM
    beats the sparse (gather+segment) SpMM.  Returns {size: density}."""
    import spmm_tpu as st

    table: Dict[int, float] = {}
    for size in sizes:
        crossover = None
        for density in densities:
            A = st.random(size, size, density, format="csr", random_state=0)
            B = jnp.ones((size, 128), jnp.float32)
            t_sparse = _median_ms(lambda: st.spmm(A, B, via="csr"))
            t_dense = _median_ms(lambda: st.spmm(A, B, via="dense"))
            if verbose:
                print(f"n={size} d={density}: sparse {t_sparse:.3f} ms "
                      f"dense {t_dense:.3f} ms")
            if t_dense <= t_sparse and crossover is None:
                crossover = density
        table[size] = crossover if crossover is not None else 1.0
    if save_path:
        with open(save_path, "w") as f:
            json.dump({str(k): v for k, v in table.items()}, f)
        if verbose:
            print(f"saved break-even table to {save_path}")
    return table


def load_break_even(path: str = _DEFAULT_CACHE) -> Optional[Dict[int, float]]:
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return {int(k): float(v) for k, v in raw.items()}
