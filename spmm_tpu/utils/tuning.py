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


def _scan_ms(body_fn, init, consts=(), k: int = 50, reps: int = 5,
             call_overhead: Optional[float] = None) -> float:
    """Device time per iteration: K data-chained iterations inside one
    program, minus the measured per-call overhead (the dev relay charges
    ~30 ms per program call — see bench.py).

    Pass large operands via `consts`, NOT as closures: closure arrays are
    embedded in the serialized program, which the relay's compile endpoint
    rejects above a size limit (HTTP 413 at 8192² dense).
    """
    import statistics

    from jax import lax

    if call_overhead is None:
        call_overhead = _measure_call_overhead(k, reps)

    @jax.jit
    def loop(x0, *cs):
        def body(c, _):
            return body_fn(c, *cs), ()
        cf, _ = lax.scan(body, x0, None, length=k)
        return cf

    jax.block_until_ready(loop(init, *consts))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(init, *consts))
        ts.append((time.perf_counter() - t0) * 1e3)
    return (statistics.median(ts) - call_overhead) / k


_CALL_OVERHEAD_CACHE: Dict[int, float] = {}


def _measure_call_overhead(k: int, reps: int = 5) -> float:
    import statistics

    from jax import lax

    if k in _CALL_OVERHEAD_CACHE:
        return _CALL_OVERHEAD_CACHE[k]

    @jax.jit
    def trivial(x):
        def body(c, _):
            return c * 1.0000001, ()
        cf, _ = lax.scan(body, x, None, length=k)
        return cf

    jax.block_until_ready(trivial(jnp.float32(1.0)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(jnp.float32(1.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    _CALL_OVERHEAD_CACHE[k] = statistics.median(ts)
    return _CALL_OVERHEAD_CACHE[k]


def calibrate_break_even(sizes: Sequence[int] = (1024, 2048, 4096, 8192),
                         densities: Sequence[float] = (
                             0.001, 0.003, 0.01, 0.03, 0.1),
                         save_path: Optional[str] = _DEFAULT_CACHE,
                         verbose: bool = True) -> Dict[int, float]:
    """For each size, find the lowest density at which the dense MXU SpMM
    beats the sparse (gather+segment) SpMM.  Returns {size: density}.

    Timing is in-scan with call-overhead subtraction so the measurement
    survives the dev relay's ~30 ms per-call cost.
    """
    import spmm_tpu as st
    from spmm_tpu.ops.spmm import _csr_spmm

    table: Dict[int, float] = {}
    for size in sizes:
        crossover = None
        for density in densities:
            A = st.random(size, size, density, format="csr", random_state=0)
            B = jnp.ones((size, 128), jnp.float32)
            ad = A.toarray()
            alpha = jnp.float32(1.0)

            def sparse_body(x, ip, ix, dv):
                y = _csr_spmm(ip, ix, dv, x, alpha)
                return x + 0.0 * y

            def dense_body(x, admat):
                y = jnp.dot(admat, x,
                            precision=jax.lax.Precision.HIGHEST,
                            preferred_element_type=jnp.float32)
                return x + 0.0 * y

            t_sparse = _scan_ms(sparse_body, B,
                                (A.indptr, A.indices, A.data))
            t_dense = _scan_ms(dense_body, B, (ad,))
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


def load_break_even(path: Optional[str] = None
                    ) -> Optional[Dict[int, float]]:
    if path is None:
        path = _DEFAULT_CACHE  # read at call time so tests can repoint it
    if not os.path.exists(path):
        return None
    with open(path) as f:
        raw = json.load(f)
    return {int(k): float(v) for k, v in raw.items()}
