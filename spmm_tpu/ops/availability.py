"""Op availability table — `cupyx.cusparse.check_availability` analogue.

The reference gates every op on a CUDA-version table
(/root/reference modify_src/cupy-src/cupyx/cusparse.py:81-187: e.g.
`'spgemm': (11100, None)`, legacy `csrmv`/`csrmm2` removed ≥ CUDA 11).  The
TPU build's ops are all backend-portable JAX programs, so the table encodes
*backend* capability instead: everything runs everywhere; entries flag ops
whose fast path needs a TPU (Pallas kernels interpret elsewhere).
"""

from __future__ import annotations

import jax

# op → (available backends, fast-path backends)
_AVAILABILITY = {
    "spmv": ({"cpu", "tpu", "gpu"}, {"tpu"}),
    "spmm": ({"cpu", "tpu", "gpu"}, {"tpu"}),
    "spgemm": ({"cpu", "tpu", "gpu"}, {"tpu"}),
    "spgemm_fixed": ({"cpu", "tpu", "gpu"}, {"tpu"}),
    "sddmm": ({"cpu", "tpu", "gpu"}, {"tpu"}),
    "bsr_spmm_pallas": ({"cpu", "tpu"}, {"tpu"}),
    "csrsort": ({"cpu", "tpu", "gpu"}, set()),
    "coosort": ({"cpu", "tpu", "gpu"}, set()),
    "coo2csr": ({"cpu", "tpu", "gpu"}, set()),
    "csr2csc": ({"cpu", "tpu", "gpu"}, set()),
    "denseToSparse": ({"cpu", "tpu", "gpu"}, set()),
    "sparseToDense": ({"cpu", "tpu", "gpu"}, set()),
    # legacy cuSPARSE names kept for parity: always unavailable, like on
    # CUDA ≥ 11 in the reference (cusparse.py:82-85)
    "csrmv": (set(), set()),
    "csrmm2": (set(), set()),
}


def check_availability(name: str, backend: str | None = None) -> bool:
    """True iff op `name` is available on the (current) backend."""
    if name not in _AVAILABILITY:
        raise KeyError(f"unknown op {name!r}")
    backend = backend or jax.default_backend()
    return backend in _AVAILABILITY[name][0]


def has_fast_path(name: str, backend: str | None = None) -> bool:
    """True iff op `name` runs its optimized (TPU) path on this backend."""
    if name not in _AVAILABILITY:
        raise KeyError(f"unknown op {name!r}")
    backend = backend or jax.default_backend()
    return backend in _AVAILABILITY[name][1]
