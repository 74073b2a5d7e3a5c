"""Operator layer (the `cupyx.cusparse` analogue): SpMV / SpMM / SpGEMM /
SDDMM wrappers, element-wise ops, dispatch, and shared static-shape
primitives."""

from spmm_tpu.ops.spmv import spmv, spmv_plan  # noqa: F401
from spmm_tpu.ops.spmm import spmm  # noqa: F401
from spmm_tpu.ops.spgemm import spgemm, spgemm_nnz_estimate  # noqa: F401
from spmm_tpu.ops.sddmm import sddmm  # noqa: F401
from spmm_tpu.ops.dispatch import matmul, break_even_density  # noqa: F401
from spmm_tpu.ops.availability import (  # noqa: F401
    check_availability,
    has_fast_path,
)
from spmm_tpu.ops.spgemm import spgemm_fixed  # noqa: F401
from spmm_tpu.ops.serving import spgemm_plan, SpgemmPlan  # noqa: F401
from spmm_tpu.ops import elementwise  # noqa: F401

__all__ = [
    "spmv",
    "spmv_plan",
    "spmm",
    "spgemm",
    "spgemm_nnz_estimate",
    "spgemm_fixed",
    "spgemm_plan",
    "SpgemmPlan",
    "sddmm",
    "matmul",
    "break_even_density",
    "elementwise",
]
