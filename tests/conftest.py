"""Test configuration: run on CPU with 8 virtual devices.

Mirrors the reference's "distributed tests without a cluster" strategy
(/root/reference tests/cupyx_tests/distributed_tests/comm_runner.py): multi-
device semantics are exercised on one host.  On TPU hardware the same tests
run on the real mesh; CI uses `--xla_force_host_platform_device_count`.
"""

import os

# Force CPU: the ambient environment may pin JAX_PLATFORMS to a TPU plugin,
# and a sitecustomize may have imported jax before this file runs — so set
# both the env (for fresh interpreters) and jax.config (for this one;
# backends initialise lazily, so the override still lands).
# Set SPMM_TPU_TEST_PLATFORM=tpu to run the suite on real hardware instead.
_platform = os.environ.get("SPMM_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of small
# static-shape kernels; caching makes re-runs fast.
if os.environ.get("SPMM_TPU_TEST_NO_CACHE", "") != "1":
    _CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
