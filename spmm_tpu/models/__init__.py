"""Synthetic matrix families used by benchmarks and tests."""

from spmm_tpu.models.matrices import (  # noqa: F401
    FAMILIES,
    banded,
    block_sparse,
    power_law_rows,
    uniform,
)
