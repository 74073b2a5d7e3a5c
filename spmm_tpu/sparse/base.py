"""Base class for the TPU sparse containers.

Provides the format-generic API of the reference's `spmatrix`
(/root/reference modify_src/cupy-src/cupyx/scipy/sparse/_base.py): shape /
dtype / nnz properties, `asformat`, arithmetic entry points, and the
`__matmul__` → dispatch-table routing (`_base.py:130-134` routes `@` to
`__mul__`; here `@` routes to `spmm_tpu.ops.dispatch`).

Design differences from the reference (deliberate, TPU-first):
  * containers are **immutable pytrees** — every "mutating" canonicalisation
    (`sort_indices`, `sum_duplicates`) returns a new container, so they can
    flow through `jax.jit` / `shard_map` boundaries as ordinary pytrees;
  * `nnz` is static Python metadata (XLA needs static shapes); component
    arrays are exactly `nnz`-sized at the eager API boundary.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class SparseMatrix:
    """Abstract base for COO / CSR / CSC / BSR."""

    format: str = "base"

    # -- basic properties ---------------------------------------------------

    @property
    def shape(self) -> Tuple[int, int]:
        return self._shape

    @property
    def ndim(self) -> int:
        return 2

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    def getnnz(self, axis=None):
        """Stored-entry count, total or per row/column (scipy `getnnz`)."""
        if axis is None:
            return self.nnz
        if axis in (0, -2):
            coo = self.tocoo()
            return np.bincount(np.asarray(coo.col), minlength=self.shape[1])
        if axis in (1, -1):
            coo = self.tocoo()
            return np.bincount(np.asarray(coo.row), minlength=self.shape[0])
        raise ValueError(f"axis out of range: {axis}")

    @property
    def density(self) -> float:
        m, n = self.shape
        return self.nnz / float(m * n) if m and n else 0.0

    @property
    def T(self):
        return self.transpose()

    # -- conversion protocol ------------------------------------------------

    def tocoo(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def tocsr(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def tocsc(self):
        return self.tocsr().tocsc()

    def tobsr(self, blocksize=None):
        from spmm_tpu.sparse import bsr as _bsr

        return _bsr.csr_to_bsr(self.tocsr(), blocksize=blocksize)

    def todia(self):
        from spmm_tpu.sparse import dia as _dia

        return _dia.coo_to_dia(self.tocoo())

    def todense(self, order=None, out=None):
        return self.toarray(order=order, out=out)

    def toarray(self, order=None, out=None):  # pragma: no cover - abstract
        raise NotImplementedError

    @staticmethod
    def _check_order(order, out):
        """Validate scipy/cupy `toarray(order=, out=)` arguments.  XLA
        arrays have no Fortran layout; 'F' is accepted and returns the
        same values (layout is an XLA-internal concern on TPU)."""
        if order not in (None, 'C', 'F', 'c', 'f'):
            raise TypeError(f'order not understood: {order!r}')
        if out is not None:
            raise ValueError('sparse toarray does not support out=')

    def asformat(self, format: str):
        if format is None or format == self.format:
            return self
        try:
            convert = getattr(self, "to" + format)
        except AttributeError:
            raise ValueError(f"Format {format!r} is unknown.")
        return convert()

    def transpose(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def conj(self):
        return self._with_data(jnp.conj(self.data))

    def copy(self):
        return self._with_data(self.data)

    def astype(self, dtype):
        return self._with_data(self.data.astype(dtype))

    def asfptype(self):
        """Upcast to a floating-point dtype if not already one (scipy
        `asfptype`; float32 is the TPU-native target for integer data)."""
        if jnp.issubdtype(self.dtype, jnp.floating) or jnp.issubdtype(
                self.dtype, jnp.complexfloating):
            return self
        return self.astype(jnp.float32)

    def __len__(self):
        raise TypeError("sparse matrix length is ambiguous; "
                        "use getnnz() or shape[0]")

    def __iter__(self):
        # row iteration, like scipy (legacy protocol would loop forever
        # without an explicit __iter__/IndexError); non-CSR formats
        # iterate via their CSR view
        mat = self if self.format == "csr" else self.tocsr()
        for i in range(self.shape[0]):
            yield mat[i]

    def reshape(self, *shape, order="C"):
        """Reshape to a 2-D shape with the same element count (scipy
        `reshape`): flat position is preserved in the given order."""
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        if len(shape) != 2:
            raise ValueError("sparse reshape requires a 2-D shape")
        m2, n2 = shape
        m, n = self.shape
        if m2 == -1:
            m2 = (m * n) // n2
        if n2 == -1:
            n2 = (m * n) // m2
        if m2 * n2 != m * n:
            raise ValueError(f"cannot reshape {self.shape} into {shape}")
        if order not in ("C", "F"):
            raise ValueError("order must be 'C' or 'F'")
        from spmm_tpu.sparse.coo import COO

        coo = self.tocoo()
        row = np.asarray(coo.row, np.int64)
        col = np.asarray(coo.col, np.int64)
        if order == "C":
            flat = row * n + col
            r2, c2 = flat // n2, flat % n2
        else:
            flat = col * m + row
            r2, c2 = flat % m2, flat // m2
        out = COO((coo.data, (r2, c2)), shape=(int(m2), int(n2)))
        return out.asformat(self.format) if self.format in (
            "csr", "csc", "coo") else out

    def resize(self, shape):
        """Resize in place (scipy `resize`): entries outside the new
        shape are dropped.  Returns None like scipy."""
        m2, n2 = int(shape[0]), int(shape[1])
        coo = self.tocoo()
        row = np.asarray(coo.row)
        col = np.asarray(coo.col)
        keep = (row < m2) & (col < n2)
        from spmm_tpu.sparse.coo import COO

        out = COO((np.asarray(coo.data)[keep], (row[keep], col[keep])),
                  shape=(m2, n2)).asformat(self.format)
        self.__dict__.update(out.__dict__)

    # -- scipy bridge (host-side; used by tests and serialization) ---------

    def to_scipy(self):
        import scipy.sparse as sp

        coo = self.tocoo()
        data = np.asarray(coo.data)
        if data.dtype not in (np.float32, np.float64, np.complex64,
                              np.complex128) and not np.issubdtype(
                                  data.dtype, np.integer):
            data = data.astype(np.float32)  # e.g. bfloat16 → f32 bridge
        return sp.coo_matrix(
            (data, (np.asarray(coo.row), np.asarray(coo.col))),
            shape=self.shape,
        ).asformat(self.format if self.format in ("csr", "csc", "coo") else "csr")

    # -- arithmetic ---------------------------------------------------------

    def __matmul__(self, other):
        from spmm_tpu.ops import dispatch

        if jnp.isscalar(other) or (
            isinstance(other, (jax.Array, np.ndarray)) and other.ndim == 0
        ):
            # Matches spmatrix.__matmul__ rejecting scalars (_base.py:130-134).
            raise ValueError("Scalar operands are not allowed, use '*' instead")
        return dispatch.matmul(self, other)

    def __rmatmul__(self, other):
        from spmm_tpu.ops import dispatch

        if jnp.isscalar(other):
            raise ValueError("Scalar operands are not allowed, use '*' instead")
        return dispatch.rmatmul(self, other)

    def dot(self, other):
        # scipy `.dot` accepts scalars (routes to scalar multiply);
        # `@` rejects them (test_csr.py test_dot_scalar vs matmul)
        if np.isscalar(other) or (
                hasattr(other, "ndim") and other.ndim == 0):
            return self.__mul__(other)
        from spmm_tpu.ops import dispatch

        return dispatch.matmul(self, other)

    def __mul__(self, other):
        from spmm_tpu.ops import dispatch

        if jnp.isscalar(other) or (
            isinstance(other, (jax.Array, np.ndarray)) and other.ndim == 0
        ):
            return self._with_data(self.data * other)
        # Reference `__mul__` doubles as matmul (_csr.py:151-226).
        return dispatch.matmul(self, other)

    def __rmul__(self, other):
        if jnp.isscalar(other) or (
            isinstance(other, (jax.Array, np.ndarray)) and other.ndim == 0
        ):
            return self._with_data(other * self.data)
        from spmm_tpu.ops import dispatch

        return dispatch.rmatmul(self, other)

    def __truediv__(self, other):
        if jnp.isscalar(other):
            return self._with_data(self.data / other)
        raise NotImplementedError

    def __neg__(self):
        return self._with_data(-self.data)

    def multiply(self, other):
        """Element-wise product."""
        from spmm_tpu.ops import elementwise

        return elementwise.multiply(self, other)

    def __add__(self, other):
        from spmm_tpu.ops import elementwise

        return elementwise.add(self, other)

    def __sub__(self, other):
        from spmm_tpu.ops import elementwise

        return elementwise.add(self, -other if issparse(other) else self._neg_other(other))

    def _neg_other(self, other):
        return -other

    # -- reductions ---------------------------------------------------------

    def sum(self, axis=None):
        coo = self.tocoo()
        if axis is None:
            return jnp.sum(coo.data)
        if axis in (0, -2):
            return (
                jnp.zeros((self.shape[1],), self.dtype).at[coo.col].add(coo.data)
            )
        if axis in (1, -1):
            return (
                jnp.zeros((self.shape[0],), self.dtype).at[coo.row].add(coo.data)
            )
        raise ValueError(f"axis out of range: {axis}")

    def mean(self, axis=None):
        m, n = self.shape
        if axis is None:
            return self.sum() / (m * n)
        denom = m if axis in (0, -2) else n
        return self.sum(axis=axis) / denom

    def max(self, axis=None, out=None, *, explicit=False):
        """Maximum, whole-matrix or along an axis (`_data.py:260-295`).

        Implicit zeros participate unless `explicit=True` (reduce stored
        values only).  Axis reductions return a sparse (1, n) / (m, 1)
        matrix with zero results compressed out, matching the reference's
        `_min_or_max_axis` COO construction."""
        return self._min_or_max(axis, out, "max", explicit)

    def min(self, axis=None, out=None, *, explicit=False):
        """Minimum — see `max` (`_data.py:296-331`)."""
        return self._min_or_max(axis, out, "min", explicit)

    def _min_or_max(self, axis, out, which, explicit):
        if out is not None:
            raise ValueError(
                "Sparse matrices do not support an 'out' parameter.")
        m, n = self.shape
        if axis is None:
            if m == 0 or n == 0:
                raise ValueError("zero-size array to reduction operation")
            coo = self.tocoo()
            op = jnp.max if which == "max" else jnp.min
            stored = op(coo.data) if self.nnz else jnp.asarray(0, self.dtype)
            if explicit or self.nnz == m * n:
                return stored
            cmp = jnp.maximum if which == "max" else jnp.minimum
            return cmp(stored, jnp.asarray(0, self.dtype))
        if axis < 0:
            axis += 2
        if axis not in (0, 1):
            raise ValueError(f"axis out of range: {axis}")
        if self.shape[axis] == 0:
            raise ValueError("zero-size array to reduction operation")
        M = self.shape[1 - axis]
        coo = self.tocoo()
        major = np.asarray(coo.row if axis == 1 else coo.col)
        data = np.asarray(coo.data)
        npop = np.maximum if which == "max" else np.minimum
        fill = -np.inf if which == "max" else np.inf
        red = np.full((M,), fill)
        npop.at(red, major, data)
        counts = np.bincount(major, minlength=M)
        value = np.where(counts > 0, red, 0).astype(self.dtype)
        if not explicit:
            # rows/cols with an implicit zero compete against 0
            value = np.where(counts < self.shape[axis],
                             npop(value, np.zeros((), self.dtype)), value)
        else:
            value = np.where(counts > 0, value, 0)
        return self._vector_as_sparse(value, axis)

    def _vector_as_sparse(self, value, axis):
        """(M,) host vector → compressed sparse (1, M) or (M, 1) COO."""
        from spmm_tpu.sparse.coo import COO

        (idx,) = np.nonzero(value)
        vals = value[idx]
        zeros = np.zeros_like(idx)
        if axis == 0:
            return COO((vals, (zeros, idx)), shape=(1, len(value)))
        return COO((vals, (idx, zeros)), shape=(len(value), 1))

    def argmax(self, axis=None, out=None):
        """Index of the maximum (implicit zeros participate; first index
        on ties — numpy-on-dense semantics, which the reference's
        `_arg_min_or_max` machinery reproduces; `_data.py:332-355`)."""
        return self._arg_min_or_max(axis, out, np.argmax)

    def argmin(self, axis=None, out=None):
        """Index of the minimum — see `argmax` (`_data.py:356-381`)."""
        return self._arg_min_or_max(axis, out, np.argmin)

    def _arg_min_or_max(self, axis, out, npop):
        if out is not None:
            raise ValueError(
                "Sparse matrices do not support an 'out' parameter.")
        m, n = self.shape
        if m == 0 or n == 0:
            raise ValueError("Cannot apply the operation to an empty matrix.")
        arr = np.asarray(self.toarray())
        if axis is None:
            return int(npop(arr))
        if axis < 0:
            axis += 2
        if axis not in (0, 1):
            raise ValueError(f"axis out of range: {axis}")
        value = npop(arr, axis=axis)
        return value[None, :] if axis == 0 else value[:, None]

    # -- data ops (the `_data.py` analogue: elementwise on stored values) ---

    def __abs__(self):
        return self._with_data(jnp.abs(self.data))

    def abs(self):
        return self.__abs__()

    def power(self, p):
        """Element-wise power of stored values (scipy `.power`)."""
        return self._with_data(jnp.power(self.data, p))

    def sqrt(self):
        return self._with_data(jnp.sqrt(self.data))

    def log1p(self):
        return self._with_data(jnp.log1p(self.data))

    def expm1(self):
        return self._with_data(jnp.expm1(self.data))

    def sign(self):
        return self._with_data(jnp.sign(self.data))

    def ceil(self):
        return self._with_data(jnp.ceil(self.data))

    def floor(self):
        return self._with_data(jnp.floor(self.data))

    def rint(self):
        return self._with_data(jnp.rint(self.data))

    # the rest of the reference's zero-preserving unary-ufunc surface
    # (`_data.py:12-17` `_ufuncs` + `_install_ufuncs`): each applies to
    # stored values only (f(0) == 0 for all of them)

    def sin(self):
        return self._with_data(jnp.sin(self.data))

    def tan(self):
        return self._with_data(jnp.tan(self.data))

    def arcsin(self):
        return self._with_data(jnp.arcsin(self.data))

    def arctan(self):
        return self._with_data(jnp.arctan(self.data))

    def sinh(self):
        return self._with_data(jnp.sinh(self.data))

    def tanh(self):
        return self._with_data(jnp.tanh(self.data))

    def arcsinh(self):
        return self._with_data(jnp.arcsinh(self.data))

    def arctanh(self):
        return self._with_data(jnp.arctanh(self.data))

    def deg2rad(self):
        return self._with_data(jnp.deg2rad(self.data))

    def rad2deg(self):
        return self._with_data(jnp.rad2deg(self.data))

    def trunc(self):
        return self._with_data(jnp.trunc(self.data))

    def maximum_scalar(self, s):
        if s > 0:
            raise ValueError("maximum with positive scalar densifies")
        return self._with_data(jnp.maximum(self.data, s))

    def minimum_scalar(self, s):
        if s < 0:
            raise ValueError("minimum with negative scalar densifies")
        return self._with_data(jnp.minimum(self.data, s))

    # -- elementwise extrema & comparisons (reference container surface:
    # -- test_csr.py TestCsrMatrixMaximumMinimum / TestCsrMatrixComparison;
    # -- cupy sparse supports row/col broadcasting that scipy lacks) -------

    def _ewise_dense(self, other, np_op, dense_result):
        """Shared machinery for maximum/minimum/comparisons with a
        non-zero-preserving or broadcasting rhs.

        These are API-surface ops, not compute-path ops — evaluated on the
        host dense form (m x n), then re-sparsified unless `dense_result`
        (zero background maps to nonzero/True, or the rhs was dense — the
        reference returns dense there too).  Shape rules follow the
        reference: exact match, or (1, n) / (m, 1) broadcast; anything
        else raises ValueError."""
        m, n = self.shape
        a = np.asarray(self.toarray())
        if issparse(other):
            b = np.asarray(other.toarray())
        elif np.ndim(other) == 0:
            b = other
        else:
            b = np.asarray(other)
            if b.ndim == 1:
                b = b[None, :]
        if np.ndim(b) == 2 and b.shape != (m, n) \
                and b.shape != (1, n) and b.shape != (m, 1):
            raise ValueError(f"inconsistent shapes: {self.shape} vs "
                             f"{b.shape}")
        res = np.broadcast_to(np_op(a, b), (m, n))
        if dense_result:
            return jnp.asarray(res)
        from spmm_tpu.sparse.coo import COO

        ri, ci = np.nonzero(res)
        return COO((res[ri, ci], (ri, ci)), shape=(m, n)).tocsr()

    def _extremum(self, other, jnp_op, np_op):
        if np.ndim(other) == 0 and not issparse(other):
            if np_op(np.zeros(1), other)[0] == 0:
                # zero-preserving scalar: stays sparse, data-only op
                return self._with_data(jnp_op(self.data, other))
            return self._ewise_dense(other, np_op, dense_result=True)
        return self._ewise_dense(other, np_op,
                                 dense_result=not issparse(other))

    def maximum(self, other):
        """Element-wise maximum (sparse / dense / scalar rhs, with (1, n)
        and (m, 1) broadcasting like the reference's cupyx containers).
        A positive scalar or dense rhs returns a dense array."""
        return self._extremum(other, jnp.maximum, np.maximum)

    def minimum(self, other):
        """Element-wise minimum (see `maximum`)."""
        return self._extremum(other, jnp.minimum, np.minimum)

    def _comparison(self, other, np_op, op_name):
        import warnings

        if np.ndim(other) == 0 and not issparse(other):
            zero_true = bool(np_op(np.zeros(1), other)[0])
        else:
            zero_true = bool(np_op(np.zeros(1), np.zeros(1))[0])
        if zero_true:
            warnings.warn(
                f"comparing a sparse matrix with {op_name} is inefficient "
                "(the zero background compares True)", stacklevel=3)
        dense_result = zero_true or (
            not issparse(other) and np.ndim(other) != 0)
        return self._ewise_dense(other, np_op, dense_result)

    def __eq__(self, other):
        if other is None:
            return False
        return self._comparison(other, np.equal, "==")

    def __ne__(self, other):
        if other is None:
            return True
        return self._comparison(other, np.not_equal, "!=")

    def __lt__(self, other):
        return self._comparison(other, np.less, "<")

    def __gt__(self, other):
        return self._comparison(other, np.greater, ">")

    def __le__(self, other):
        return self._comparison(other, np.less_equal, "<=")

    def __ge__(self, other):
        return self._comparison(other, np.greater_equal, ">=")

    # defining __eq__ clears the default __hash__; containers keep
    # identity hashing (they are pytree nodes, not value-hashable keys)
    __hash__ = object.__hash__

    @property
    def real(self):
        return self._with_data(jnp.real(self.data))

    @property
    def imag(self):
        return self._with_data(jnp.imag(self.data))

    def count_nonzero(self) -> int:
        return int(jnp.sum(self.data != 0))

    # -- misc ---------------------------------------------------------------

    def _with_data(self, data):  # pragma: no cover - abstract
        raise NotImplementedError

    def __repr__(self):
        m, n = self.shape
        return (
            f"<{m}x{n} sparse matrix of type {self.dtype} with {self.nnz} "
            f"stored elements in {self.format.upper()} format>"
        )


def issparse(x) -> bool:
    return isinstance(x, SparseMatrix)


isspmatrix = issparse


def _check_shape_compat(a_shape, b_shape, op="matmul"):
    if a_shape[1] != b_shape[0]:
        raise ValueError(
            f"dimension mismatch for {op}: {a_shape} @ {b_shape}"
        )
