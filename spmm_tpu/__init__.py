"""spmm_tpu — a TPU-native sparse linear-algebra framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
GPU sparse-matmul harness (wjustin784/spMM): CSR/COO/CSC/BSR containers,
SpMV / SpMM / SpGEMM (three strategies mirroring cuSPARSE ALG1/2/3 semantics,
see /root/reference modify_src/.../cupyx/cusparse.py:2007), density-aware
dense/sparse dispatch, determinism & numerical-error test suites, a benchmark
harness, and multi-device row-partitioned execution over a `jax.sharding.Mesh`.

Everything is designed TPU-first:
  * the fast SpGEMM path rides the MXU via a dense intermediate (the TPU
    analogue of a per-row hash accumulator: a perfect hash into dense columns),
  * the sparse paths use stable sorts + fixed-order segmented reductions
    (deterministic by construction — no atomics exist on TPU anyway),
  * distribution uses `shard_map` over a Mesh with XLA collectives, not
    NCCL-style point-to-point.
"""

from spmm_tpu.sparse import (  # noqa: F401
    COO,
    CSC,
    CSR,
    BSR,
    SparseMatrix,
    issparse,
    isspmatrix,
    eye,
    identity,
    random,
    rand,
    spdiags,
    diags,
    bmat,
    hstack,
    vstack,
)
from spmm_tpu.ops import (  # noqa: F401
    spgemm,
    spgemm_fixed,
    spgemm_plan,
    SpgemmPlan,
    spgemm_nnz_estimate,
    spmm,
    spmv,
    spmv_plan,
    matmul,
    sddmm,
)

__version__ = "0.1.0"

__all__ = [
    "COO",
    "CSC",
    "CSR",
    "BSR",
    "SparseMatrix",
    "issparse",
    "isspmatrix",
    "eye",
    "identity",
    "random",
    "rand",
    "spdiags",
    "diags",
    "bmat",
    "hstack",
    "vstack",
    "spgemm",
    "spgemm_fixed",
    "spgemm_plan",
    "SpgemmPlan",
    "spgemm_nnz_estimate",
    "spmm",
    "spmv",
    "spmv_plan",
    "matmul",
    "sddmm",
]
