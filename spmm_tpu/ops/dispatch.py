"""Operator dispatch: the `@` policy and density-aware dense/sparse routing.

Replicates the reference dispatch table of `csr_matrix.__mul__`
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_csr.py:151-226):

    scalar            → scale data
    CSR @ CSR         → sum_duplicates both → spgemm
    CSR @ CSC/COO     → convert rhs to CSR → spgemm
    CSR @ 1-D dense   → spmv
    CSR @ 2-D dense   → spmm

plus the TPU addition this reference's *experiments* exist to motivate:
**density-aware dense/sparse routing** using the measured break-even curve
(dense_vs_sparseGEMM — BASELINE.md shows sparse wins only below ρ ≈ 1e-2..5e-2
depending on size; on TPU the MXU moves the break-even even lower).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.ops.spgemm import spgemm as _spgemm
from spmm_tpu.ops.spmm import spmm as _spmm
from spmm_tpu.ops.spmv import spmv as _spmv


# Break-even density above which a dense MXU matmul beats sparse paths on
# TPU, by problem scale.  A measured table saved by
# `spmm_tpu.utils.tuning.calibrate_break_even()` takes precedence (loaded
# once, lazily); the hardcoded curve is the fallback, seeded from the
# reference's measured curve (BASELINE.md §break-even: ρ*≈5e-2 @ n=1024
# falling toward 1e-2 at n=8192 on GPU — the MXU moves it lower).
_BREAK_EVEN_TABLE = None
_BREAK_EVEN_LOADED = False


def _measured_break_even():
    global _BREAK_EVEN_TABLE, _BREAK_EVEN_LOADED
    if not _BREAK_EVEN_LOADED:
        from spmm_tpu.utils.tuning import load_break_even

        _BREAK_EVEN_TABLE = load_break_even()
        _BREAK_EVEN_LOADED = True
    return _BREAK_EVEN_TABLE


def reload_break_even():
    """Drop the cached calibration table (call after re-calibrating)."""
    global _BREAK_EVEN_LOADED
    _BREAK_EVEN_LOADED = False


def break_even_density(m: int, k: int, n: int) -> float:
    scale = max(m, k, n)
    table = _measured_break_even()
    if table:
        sizes = sorted(table)
        # use the calibration point at or above this scale (conservative:
        # larger problems have lower crossovers)
        for s in sizes:
            if scale <= s:
                return float(table[s])
        return float(table[sizes[-1]])
    if scale <= 2048:
        return 1.0       # small problems: dense always wins on MXU
    if scale <= 8192:
        return 3e-2
    if scale <= 32768:
        return 1e-2
    return 3e-3


def _dense_fits(m: int, k: int, n: int, itemsize: int = 4,
                budget: int = int(4e9)) -> bool:
    return itemsize * (m * k + k * n + m * n) <= budget


def matmul(a, b, alpha=1.0, alg: int = 0, mode: str = "auto"):
    """`a @ b` with a sparse.  `mode`: "auto" (density-aware), "sparse",
    "dense"."""
    from spmm_tpu.sparse.base import issparse
    from spmm_tpu.sparse.csr import CSR

    if not issparse(a):
        raise TypeError("matmul dispatch expects sparse lhs")
    b_sparse = issparse(b)
    if not b_sparse:
        b_arr = jnp.asarray(b)
        if b_arr.ndim == 1:
            return _spmv(a, b_arr, alpha=alpha)
        if b_arr.ndim == 2:
            a_csr = a.tocsr()
            m, k = a_csr.shape
            n = b_arr.shape[1]
            if mode == "dense" or (
                mode == "auto"
                and a_csr.density >= break_even_density(m, k, n)
                and _dense_fits(m, k, n)
            ):
                return _spmm(a_csr, b_arr, alpha=alpha, via="dense")
            return _spmm(a_csr, b_arr, alpha=alpha)
        raise ValueError(f"cannot multiply sparse by {b_arr.ndim}-D array")
    # sparse @ sparse → spgemm on CSR operands (reference converts CSC→CSR,
    # _csr.py:168-182)
    a_csr = a.tocsr().sum_duplicates()
    b_csr = b.tocsr().sum_duplicates()
    return _spgemm(a_csr, b_csr, alpha=alpha, alg=alg)


def rmatmul(a, other):
    """other @ a with a sparse: computed as (a.T @ other.T).T."""
    from spmm_tpu.sparse.base import issparse

    other_arr = other if issparse(other) else jnp.asarray(other)
    if not issparse(other_arr) and other_arr.ndim == 1:
        # x @ A = (A.T @ x)
        return _spmv(a.tocsr(), other_arr, transa=True)
    if not issparse(other_arr) and other_arr.ndim == 2:
        return _spmm(a.tocsr(), other_arr.T, transa=True).T
    return matmul(other_arr, a)
