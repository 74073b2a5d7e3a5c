"""Sparse containers and constructors (the `cupyx.scipy.sparse` analogue)."""

from spmm_tpu.sparse.base import SparseMatrix, issparse, isspmatrix  # noqa: F401
from spmm_tpu.sparse.coo import COO  # noqa: F401
from spmm_tpu.sparse.csr import CSR  # noqa: F401
from spmm_tpu.sparse.csc import CSC  # noqa: F401
from spmm_tpu.sparse.bsr import BSR  # noqa: F401
from spmm_tpu.sparse.dia import DIA  # noqa: F401
from spmm_tpu.sparse.construct import (  # noqa: F401
    bmat,
    diags,
    eye,
    hstack,
    identity,
    kron,
    kronsum,
    rand,
    random,
    spdiags,
    vstack,
)
from spmm_tpu.sparse.extract import find, tril, triu  # noqa: F401
from spmm_tpu.sparse import convert  # noqa: F401

# scipy-style aliases
coo_matrix = COO
csr_matrix = CSR
csc_matrix = CSC
bsr_matrix = BSR
dia_matrix = DIA


def isspmatrix_csr(x):
    return isinstance(x, CSR)


def isspmatrix_dia(x):
    return isinstance(x, DIA)


def isspmatrix_csc(x):
    return isinstance(x, CSC)


def isspmatrix_coo(x):
    return isinstance(x, COO)
