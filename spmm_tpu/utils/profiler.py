"""Benchmark / profiling harness.

Re-provides the reference's measurement stack (SURVEY.md §2.1/§5):

  * `benchmark(fn, args, n_repeat, n_warmup)` — the `cupyx.profiler.benchmark`
    analogue (/root/reference modify_src/cupy-src/cupyx/profiler/_time.py:84):
    per-repeat wall times around `jax.block_until_ready` (TPU has no CUDA
    events; dispatch+sync wall time is the end-to-end figure the reference
    reports).
  * `profile_op(name, fn)` — the `profile_op_gpu` analogue
    (SpGEMM_alg_comparison/profiler.py:108-143): one timed call with
    ΔPeak-HBM measured from `device.memory_stats()` deltas (the reference
    uses a fresh CuPy MemoryPool + a 2 kHz `memGetInfo` sampler thread; XLA
    exposes `peak_bytes_in_use` directly, no sampler needed).
  * `repeat_op(...)` — warmup + N repeats with OOM-tolerant skip
    (dense_vs_sparseGEMM/utils.py:144-197 pattern), median-of-runs summary.
  * `BenchResult` — the result-row dataclass (dense_vs_sparseGEMM/utils.py:35).
"""

from __future__ import annotations

import dataclasses
import gc
import json
import statistics
import time
from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np


@dataclasses.dataclass
class BenchResult:
    name: str
    time_ms: float
    times_ms: Sequence[float] = dataclasses.field(default_factory=list)
    peak_hbm_bytes: Optional[int] = None
    delta_hbm_bytes: Optional[int] = None
    out_shape: Optional[tuple] = None
    dtype: Optional[str] = None
    extra: dict = dataclasses.field(default_factory=dict)

    @property
    def median_ms(self) -> float:
        return statistics.median(self.times_ms) if self.times_ms else self.time_ms

    @property
    def min_ms(self) -> float:
        return min(self.times_ms) if self.times_ms else self.time_ms

    def row(self) -> str:
        peak = (f"{self.delta_hbm_bytes / 2**20:9.1f} MB"
                if self.delta_hbm_bytes is not None else "      n/a")
        return (f"{self.name:<32s} {self.median_ms:10.4f} ms  ΔHBM {peak}  "
                f"out={self.out_shape} {self.dtype or ''}")

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["median_ms"] = self.median_ms
        d["times_ms"] = list(map(float, self.times_ms))
        return json.dumps(d)


def _block(tree):
    return jax.block_until_ready(tree)


def device_memory_stats(device=None) -> dict:
    dev = device or jax.devices()[0]
    try:
        return dev.memory_stats() or {}
    except Exception:
        return {}


def benchmark(fn: Callable, args: tuple = (), n_repeat: int = 10,
              n_warmup: int = 2, name: Optional[str] = None) -> BenchResult:
    """Time `fn(*args)` with warmup; per-repeat wall time around a full sync.

    Mirrors `cupyx.profiler.benchmark(func, args, n_repeat, n_warmup)`.
    """
    for _ in range(n_warmup):
        _block(fn(*args))
    times = []
    out = None
    for _ in range(n_repeat):
        t0 = time.perf_counter()
        out = _block(fn(*args))
        times.append((time.perf_counter() - t0) * 1e3)
    shape = getattr(out, "shape", None)
    dtype = str(getattr(out, "dtype", "")) or None
    return BenchResult(name=name or getattr(fn, "__name__", "op"),
                       time_ms=statistics.median(times), times_ms=times,
                       out_shape=shape, dtype=dtype)


def profile_op(name: str, fn: Callable, device=None) -> BenchResult:
    """One timed call with ΔPeak-HBM (profile_op_gpu analogue).

    ΔPeak-HBM = peak_bytes_in_use after the op − bytes_in_use before it:
    workspace + output + transients, matching the reference's
    "drop in free memory during the op" definition
    (SpGEMM_alg_comparison/profiler.py:124-133).
    """
    dev = device or jax.devices()[0]
    gc.collect()
    before = device_memory_stats(dev)
    base = before.get("bytes_in_use")
    t0 = time.perf_counter()
    out = _block(fn())
    dt_ms = (time.perf_counter() - t0) * 1e3
    after = device_memory_stats(dev)
    peak = after.get("peak_bytes_in_use")
    delta = (peak - base) if (peak is not None and base is not None) else None
    shape = getattr(out, "shape", None)
    dtype = str(getattr(out, "dtype", "")) or None
    del out
    return BenchResult(name=name, time_ms=dt_ms, times_ms=[dt_ms],
                       peak_hbm_bytes=peak, delta_hbm_bytes=delta,
                       out_shape=shape, dtype=dtype)


def repeat_op(name: str, fn: Callable, runs: int = 10, warmup: int = 2,
              device=None, oom_ok: bool = True) -> Optional[BenchResult]:
    """Warmup + N timed repeats, OOM-tolerant (prints [SKIP] and returns
    None on OOM — the dense_vs_sparseGEMM/utils.py:155-173 pattern)."""
    try:
        for _ in range(warmup):
            _block(fn())
        times = []
        last = None
        for _ in range(runs):
            r = profile_op(name, fn, device=device)
            times.append(r.time_ms)
            last = r
        assert last is not None
        last.times_ms = times
        last.time_ms = statistics.median(times)
        return last
    except (RuntimeError, MemoryError, jax.errors.JaxRuntimeError) as e:
        if not oom_ok or ("RESOURCE_EXHAUSTED" not in str(e)
                          and "Out of memory" not in str(e)
                          and not isinstance(e, MemoryError)):
            raise
        print(f"[SKIP] {name}: {type(e).__name__}: {str(e)[:200]}")
        cleanup_device()
        return None


def cleanup_device():
    """Free what can be freed between sweep configs (cleanup_gpu analogue,
    dense_vs_sparseGEMM/utils.py:17-28)."""
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:
        pass


class trace:
    """Context manager around `jax.profiler` tracing (the `cupy.cuda.profiler`
    start/stop marker analogue, SpGEMM_alg_comparison/profiler.py:21):

        with profiler.trace("/tmp/tb"):
            run_op()

    View with TensorBoard's profile plugin."""

    def __init__(self, logdir: str = "/tmp/spmm_tpu_trace"):
        self.logdir = logdir

    def __enter__(self):
        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


def speed_of_light_spmv_s(nnz: int, hbm_gbps: float = 819.0) -> float:
    """Bandwidth-bound lower bound for CSR SpMV: stream data+indices once.

    v5e HBM ≈ 819 GB/s.  Bytes = nnz * (4 data + 4 index) + output.
    """
    return (nnz * 8) / (hbm_gbps * 1e9)


def nnz_per_second(nnz: int, time_ms: float) -> float:
    return nnz / (time_ms * 1e-3) if time_ms > 0 else float("inf")
