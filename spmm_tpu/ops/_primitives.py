"""Static-shape jitted building blocks shared by containers and kernels.

These are the TPU-native replacements for the reference's cuSPARSE utility
routines (`csrsort`, `coosort`, `coo2csr`, `csr2cscEx2`, `sum_duplicates` — see
/root/reference modify_src/cupy-src/cupy_backends/cuda/libs/cusparse.pyx and
cupyx/scipy/sparse/_coo.py:356-539).  Everything here is:

  * static-shape (XLA requirement): any data-dependent size is computed by a
    "count" kernel whose scalar result is read back on the host before the
    sized kernel is traced;
  * deterministic by construction: stable sorts + fixed-order reductions
    (the reference relies on cuSPARSE being bitwise-stable per algorithm,
    see deterministic/test_deterministic.sh — we get the same property for
    free because nothing here uses atomics);
  * int32-indexed.  Lexicographic (row, col) ordering never materialises an
    int64 key: when ``m * n < 2**31`` a fused int32 key is used, otherwise two
    stable sorts (by col, then by row) give the same ordering.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

INDEX_DTYPE = jnp.int32


def _can_fuse_key(shape: Tuple[int, int]) -> bool:
    return int(shape[0]) * int(shape[1]) < 2**31


# ---------------------------------------------------------------------------
# lexicographic (row, col) sort
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("ncols", "fuse"))
def _lexsort_rowcol_impl(row, col, carried, ncols: int, fuse: bool):
    if fuse:
        key = row * jnp.asarray(ncols, row.dtype) + col
        out = lax.sort((key, row, col) + tuple(carried), num_keys=1,
                       is_stable=True)
        return out[1], out[2], out[3:]
    # Two stable passes: sort by col, then by row.  Stability of the second
    # pass preserves the col order within equal rows → (row, col) lex order.
    out = lax.sort((col, row) + tuple(carried), num_keys=1, is_stable=True)
    col1, row1, carried1 = out[0], out[1], out[2:]
    out = lax.sort((row1, col1) + tuple(carried1), num_keys=1, is_stable=True)
    return out[0], out[1], out[2:]


def lexsort_rowcol(row, col, carried: Sequence[jax.Array], shape):
    """Stable-sort COO triplets into (row, col) lexicographic order.

    Returns (row_sorted, col_sorted, tuple_of_carried_sorted).
    """
    r, c, rest = _lexsort_rowcol_impl(row, col, tuple(carried),
                                      ncols=int(shape[1]),
                                      fuse=_can_fuse_key(shape))
    return r, c, tuple(rest)


# ---------------------------------------------------------------------------
# indptr <-> row ids
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("nrows",))
def build_indptr(rows_sorted, nrows: int):
    """CSR indptr from sorted row ids (the `coo2csr` of the TPU build)."""
    counts = jnp.bincount(rows_sorted, length=nrows).astype(INDEX_DTYPE)
    return jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(counts, dtype=INDEX_DTYPE)]
    )


@functools.partial(jax.jit, static_argnames=("nnz",))
def rows_from_indptr(indptr, nnz: int):
    """Expand CSR indptr to per-entry row ids (the `csr2coo` direction).

    row[t] = #{r ≥ 1 : indptr[r] ≤ t}, computed as a tiny scatter of row-end
    marks followed by a cumsum — NOT searchsorted, which XLA lowers to a
    per-element binary search that is ~100x slower on TPU (measured in
    benchmarks/strategy_lab.py).
    """
    if nnz == 0:
        return jnp.zeros((0,), INDEX_DTYPE)
    marks = jnp.zeros((nnz + 1,), INDEX_DTYPE).at[indptr[1:]].add(
        1, mode="drop")
    return jnp.cumsum(marks[:nnz], dtype=INDEX_DTYPE)


# ---------------------------------------------------------------------------
# duplicate detection / summation (canonicalisation)
# ---------------------------------------------------------------------------


@jax.jit
def count_unique_sorted(row_sorted, col_sorted):
    """Number of distinct (row, col) pairs in lex-sorted coordinates."""
    if row_sorted.shape[0] == 0:
        return jnp.zeros((), INDEX_DTYPE)
    new_group = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (row_sorted[1:] != row_sorted[:-1])
            | (col_sorted[1:] != col_sorted[:-1]),
        ]
    )
    return jnp.sum(new_group, dtype=INDEX_DTYPE)


@functools.partial(jax.jit, static_argnames=("count",))
def compact_positions(flags, count: int):
    """Positions of the first `count` set flags, in order, via stable-sort
    compaction (jnp.nonzero lowers to a serialised full-length scatter on
    TPU; an (int8 key, iota) sort is ~30x faster at scale)."""
    n = flags.shape[0]
    keys = jnp.where(flags, jnp.int8(0), jnp.int8(1))
    idxs = jnp.arange(n, dtype=INDEX_DTYPE)
    _, pos = lax.sort((keys, idxs), num_keys=1, is_stable=True)
    return pos[:count]


@functools.partial(jax.jit, static_argnames=("nout",))
def sum_duplicates_sorted(row_sorted, col_sorted, data_sorted, nout: int):
    """Collapse equal (row, col) runs by summation; output has `nout` entries.

    `nout` must equal `count_unique_sorted(...)` (host-read before tracing).
    Reduction order within a run is the sorted order (fixed → deterministic).
    """
    n = row_sorted.shape[0]
    if n == 0:
        return (
            jnp.zeros((0,), INDEX_DTYPE),
            jnp.zeros((0,), INDEX_DTYPE),
            jnp.zeros((0,), data_sorted.dtype),
        )
    new_group = jnp.concatenate(
        [
            jnp.ones((1,), jnp.bool_),
            (row_sorted[1:] != row_sorted[:-1])
            | (col_sorted[1:] != col_sorted[:-1]),
        ]
    )
    seg_ids = jnp.cumsum(new_group.astype(INDEX_DTYPE)) - 1
    out_data = jax.ops.segment_sum(
        data_sorted, seg_ids, num_segments=nout, indices_are_sorted=True
    )
    first_pos = compact_positions(new_group, nout)
    return row_sorted[first_pos], col_sorted[first_pos], out_data


@jax.jit
def has_canonical_format_sorted(row, col, indptr_like=None):
    """True iff lex-sorted coordinates contain no duplicate (row, col)."""
    if row.shape[0] <= 1:
        return jnp.asarray(True)
    dup = (row[1:] == row[:-1]) & (col[1:] == col[:-1])
    return ~jnp.any(dup)


@jax.jit
def is_sorted_canonical(row, col):
    """True iff (row, col) pairs are strictly increasing lexicographically.

    This is the TPU analogue of the reference's GPU canonical-format check
    (cupyx/scipy/sparse/_compressed.py:859-898): sorted AND duplicate-free.
    """
    if row.shape[0] <= 1:
        return jnp.asarray(True)
    row_ok = row[1:] > row[:-1]
    col_ok = (row[1:] == row[:-1]) & (col[1:] > col[:-1])
    return jnp.all(row_ok | col_ok)


# ---------------------------------------------------------------------------
# dense <-> sparse
# ---------------------------------------------------------------------------


@jax.jit
def count_nonzero_dense(x):
    return jnp.sum(x != 0, dtype=INDEX_DTYPE)


@functools.partial(jax.jit, static_argnames=("nnz",))
def dense_to_coo(x, nnz: int):
    """Extract the nonzero triplets of a dense matrix in row-major order.

    Mirrors cuSPARSE `denseToSparse` (cupyx/cusparse.py:1733) semantics.
    """
    mask = (x != 0).ravel()
    flat_idx = compact_positions(mask, nnz)
    ncols = x.shape[1]
    row = flat_idx // ncols
    col = flat_idx % ncols
    return row, col, x.ravel()[flat_idx]


@functools.partial(jax.jit, static_argnames=("shape",))
def coo_to_dense(row, col, data, shape: Tuple[int, int]):
    """Scatter-add COO triplets into a dense matrix (`sparseToDense`)."""
    out = jnp.zeros(shape, data.dtype)
    return out.at[row, col].add(data, indices_are_sorted=False,
                                unique_indices=False)


@functools.partial(jax.jit, static_argnames=("shape",))
def csr_to_dense_canonical(indptr, indices, data, shape: Tuple[int, int]):
    """Densify a canonical CSR.  Hot path for the ALG1 (MXU) SpGEMM.

    Canonical CSR ⇒ flattened scatter indices are unique and ascending; a
    1-D flat scatter lowers ~5x better than the 2-D (row, col) form on TPU
    (measured in benchmarks/strategy_lab.py).
    """
    m, k = shape
    nnz = data.shape[0]
    row = rows_from_indptr(indptr, nnz)
    flat = row * jnp.asarray(k, INDEX_DTYPE) + indices
    out = jnp.zeros((m * k,), data.dtype)
    return out.at[flat].set(data, indices_are_sorted=True,
                            unique_indices=True).reshape(m, k)


# ---------------------------------------------------------------------------
# fp32-grade matmul via manual bf16 splits
# ---------------------------------------------------------------------------


def _bf16_split3(x):
    """x (f32) = hi + mid + lo, each exactly representable in bf16
    (8+8+8 mantissa bits ⊇ f32's 24).

    The splits are produced with mantissa bit-masking rather than rounding
    casts: under `--xla_allow_excess_precision=true` (set by some TPU
    toolchains) XLA may fold `x - f32(bf16(x))` to zero, silently reducing
    a cast-based split to a single lossy pass.  Bitwise masking is opaque
    to that rewrite.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    hi = jax.lax.bitcast_convert_type(
        bits & jnp.int32(-65536), jnp.float32)          # keep top 8 man. bits
    r1 = x - hi
    bits1 = jax.lax.bitcast_convert_type(r1, jnp.int32)
    mid = jax.lax.bitcast_convert_type(
        bits1 & jnp.int32(-65536), jnp.float32)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def matmul_f32_bf16x6(a, b):
    """fp32-accuracy matmul as six bf16 MXU passes (the bf16x6 algorithm):
    Σ a_i @ b_j over split pairs of combined order ≤ 2, f32 accumulation.

    Accuracy class of `precision=HIGHEST`.  Measured on v5e the fused
    HIGHEST lowering is currently *faster* than six separate DEFAULT dots,
    so the framework uses HIGHEST by default; this stays as the portable
    spelled-out alternative.
    """
    ah, am, al = _bf16_split3(a)
    bh, bm, bl = _bf16_split3(b)

    def mm(x, y):
        return jnp.dot(x, y, preferred_element_type=jnp.float32)

    return (((mm(al, bh) + mm(am, bm)) + mm(ah, bl))
            + (mm(am, bh) + mm(ah, bm))) + mm(ah, bh)


# ---------------------------------------------------------------------------
# fixed-tree segmented sum (bit-exact cross-implementation path)
# ---------------------------------------------------------------------------


@jax.jit
def segsum_tree(values, head_flags):
    """Segmented inclusive sum via Hillis–Steele doubling, fixed order.

    ``head_flags[i]`` is True where segment ``i`` starts.  Returns the
    inclusive running sum within each segment; the segment total is the value
    at the last position of the segment.

    The exact floating-point reduction tree is defined by this doubling
    schedule, so an independent C++ implementation replaying the same
    schedule reproduces the result bitwise — the TPU analogue of the
    reference's CuPy-vs-raw-cuSPARSE bitwise cross-check
    (cupy_cusparse/compare_csrs_txt.py:32-46).
    """
    n = values.shape[0]
    x = values
    stop = head_flags
    d = 1
    while d < n:
        shifted_x = jnp.concatenate([jnp.zeros((d,), x.dtype), x[:-d]])
        shifted_stop = jnp.concatenate(
            [jnp.ones((d,), jnp.bool_), stop[:-d]]
        )
        x = jnp.where(stop, x, x + shifted_x)
        stop = stop | shifted_stop
        d *= 2
    return x


# ---------------------------------------------------------------------------
# 0/1 prefix sums on the MXU (triangular matmuls)
# ---------------------------------------------------------------------------


@jax.jit
def cumsum01_tri(mask_flat):
    """Inclusive prefix sum of a 0/1 vector via triangular MXU matmuls.

    XLA lowers a large `jnp.cumsum` to a log-depth chain of full-array
    passes; for 0/1 data the same prefix rides the MXU exactly:
    lane-prefix = X(R,128) @ U(128,128) upper-triangular-ones (bf16 inputs
    are exact 0/1, f32 accumulation exact for sums ≤ 2^24), then a
    two-level hierarchy over row sums.  Used by the near-dense SpGEMM
    extraction (ops/spgemm._extract_shift).
    """
    L = mask_flat.shape[0]
    if L == 0:
        return jnp.zeros((0,), INDEX_DTYPE)
    R = -(-L // 128)
    R2 = -(-R // 128)
    x = mask_flat.astype(jnp.bfloat16)
    if R * 128 != L:
        x = jnp.concatenate(
            [x, jnp.zeros((R * 128 - L,), jnp.bfloat16)])
    X = x.reshape(R, 128)
    i = lax.broadcasted_iota(INDEX_DTYPE, (128, 128), 0)
    j = lax.broadcasted_iota(INDEX_DTYPE, (128, 128), 1)
    U = (i <= j).astype(jnp.bfloat16)
    p0 = jnp.dot(X, U, preferred_element_type=jnp.float32)  # (R, 128)
    rs = p0[:, -1]  # row sums, each <= 128 (exact bf16 integers)
    rs_pad = rs
    if R2 * 128 != R:
        rs_pad = jnp.concatenate(
            [rs, jnp.zeros((R2 * 128 - R,), jnp.float32)])
    RS = rs_pad.reshape(R2, 128).astype(jnp.bfloat16)
    p1 = jnp.dot(RS, U, preferred_element_type=jnp.float32)  # (R2, 128)
    g_sums = p1[:, -1]  # per-group sums
    g_excl = jnp.cumsum(g_sums) - g_sums  # tiny (R2 elements)
    row_excl = (p1 - rs_pad.reshape(R2, 128)) + g_excl[:, None]
    row_excl = row_excl.reshape(R2 * 128)[:R]
    out = p0 + row_excl[:, None]
    return out.reshape(R * 128)[:L].astype(INDEX_DTYPE)
