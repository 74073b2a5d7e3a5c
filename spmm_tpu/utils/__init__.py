"""Utilities: profiling/benchmark harness, sweep helpers."""

from spmm_tpu.utils.profiler import (  # noqa: F401
    BenchResult,
    benchmark,
    cleanup_device,
    device_memory_stats,
    nnz_per_second,
    profile_op,
    repeat_op,
    speed_of_light_spmv_s,
)
