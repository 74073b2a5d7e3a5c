"""SpGEMM: C = alpha * A @ B with A, B both CSR — three TPU strategies.

Re-provides the reference's modified `cupyx.cusparse.spgemm(a, b, alpha, alg,
chunk_fraction, verbose)` (/root/reference
modify_src/cupy-src/cupyx/cusparse.py:2007-2142), which exposes cuSPARSE
ALG1/ALG2/ALG3.  The TPU strategies mirror the *semantics* (fast/high-memory,
balanced, chunked/low-memory) with hardware-native implementations:

  alg=1  "dense-intermediate" — the TPU analogue of the per-row hash table:
         a dense accumulator is a perfect hash into columns.  Densify A and B
         (unique, sorted scatter), one MXU matmul for values, one bf16 MXU
         matmul over 0/1 patterns for the *structural* nonzero count (so
         numerically-cancelled entries are kept, matching cuSPARSE/SciPy
         structural semantics), then compress.  Fastest; memory O(m·k+k·n+m·n).

  alg=2  "ESC, two-phase" — expand-sort-compress with exact sizing: a
         symbolic pass counts the intermediate products P (the analogue of
         `spGEMM_workEstimation`), the numeric pass expands all partial
         products, stable-sorts by (row, col) and compresses duplicates with
         a fixed-order reduction.  Memory O(P); no dense blow-up.

  alg=3  "chunked ESC" — rows of A are partitioned so each chunk carries
         ≈ chunk_fraction of the total products; a fixed workspace is reused
         across chunks (the analogue of the chunked
         `cusparseSpGEMM_estimateMemory` path, cusparse.pyx:5116-5155).
         Lowest peak memory, slowest (one sort + one host sync per chunk).

  alg=0  auto/DEFAULT: dense-intermediate when the dense footprint fits a
         budget, else ESC — mirroring "DEFAULT = ALG1" (cusparse.py:2052-2058).

Every strategy is deterministic by construction (stable sorts, fixed
reduction trees, fixed MXU reduction order): re-running any alg on the same
inputs is bitwise-identical, reproducing the property asserted by the
reference's determinism suite (deterministic/test_deterministic.sh).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.ops import _primitives as prim
from spmm_tpu.utils import memtrace

INDEX_DTYPE = prim.INDEX_DTYPE

# dense-intermediate auto-dispatch budget (bytes of dense temporaries)
_DENSE_BUDGET_BYTES = int(2e9)


# ===========================================================================
# ALG1 — dense-intermediate (MXU)
# ===========================================================================


# Marker for explicit-zero input entries: the smallest normal float32.  An
# explicit zero must stay structural (cuSPARSE semantics), so it is
# scattered as TINY; the value matmul sees 0, the pattern compare sees ≠0.
_TINY = float(np.finfo(np.float32).tiny)

# Select-shift extraction handles up to this many holes (see
# _extract_shift); beyond it the sort-based path takes over.
_SHIFT_EXTRACT_MAX_HOLES = 128

# The Pallas rolled extraction (kernels/extract_roll) streams the dense
# product once and pays ~one VMEM pass per hole beyond that, so it covers
# a far wider hole range than the select chain (which pays one full HBM
# pass per hole).  Crossover vs the sort path is around a few thousand
# holes at 1M elements.
_EXTRACT_ROLL_MAX_HOLES = 1024


def _densify_flat(indptr, indices, vals, m: int, k: int, split=None):
    """Flat scatter(s) of per-entry `vals` into a dense (m, k) array.

    `split` (optional, static): (flat_bounds, entry_splits) — four
    disjoint-range scatters into separate buffers that XLA overlaps,
    measured ~1.2x faster than one scatter (the scatter loop has a large
    fixed component).  The bounds are data-dependent, so callers that use
    them (the sized serving path) read them back once per matrix, at the
    same per-structure compile granularity as `cap`.
    """
    nnz = vals.shape[0]
    rows = prim.rows_from_indptr(indptr, nnz)
    flat = rows * jnp.asarray(k, INDEX_DTYPE) + indices
    if split is None:
        out = jnp.zeros((m * k,), vals.dtype)
        return out.at[flat].set(vals, indices_are_sorted=True,
                                unique_indices=True).reshape(m, k)
    flat_bounds, entry_splits = split
    parts = []
    for i in range(len(flat_bounds) - 1):
        lo, hi = flat_bounds[i], flat_bounds[i + 1]
        e0, e1 = entry_splits[i], entry_splits[i + 1]
        part = jnp.zeros((hi - lo,), vals.dtype).at[flat[e0:e1] - lo].set(
            vals[e0:e1], indices_are_sorted=True, unique_indices=True)
        parts.append(part)
    return jnp.concatenate(parts).reshape(m, k)


def _densify_marked(indptr, indices, data, m: int, k: int, split=None):
    """Marked densify: explicit-zero inputs carry the _TINY marker so one
    scatter yields both the value matrix (TINY→0) and the structural
    pattern (≠0).  Callers must guard against legitimate +TINY values
    (see `_tiny_collision`) and use the safe two-scatter path when found.
    """
    vals = jnp.where(data == 0, jnp.asarray(_TINY, data.dtype), data)
    return _densify_flat(indptr, indices, vals, m, k, split)


def densify_split_plan(a, nways: int = 4):
    """Static split plan for `_densify_marked`: entry quartiles and the flat
    positions bounding them (one 3-int readback per matrix)."""
    nnz = a.nnz
    m, k = a.shape
    if nnz < nways * 2:
        return None
    entry_splits = tuple(nnz * i // nways for i in range(nways + 1))
    flat = a.rows * jnp.asarray(k, INDEX_DTYPE) + a.indices
    import numpy as np_

    probe = np_.asarray(jax.device_get(
        flat[jnp.asarray(entry_splits[1:-1], INDEX_DTYPE)]))
    flat_bounds = (0,) + tuple(int(x) for x in probe) + (m * k,)
    # degenerate guard: bounds must be strictly increasing
    for i in range(len(flat_bounds) - 1):
        if flat_bounds[i + 1] <= flat_bounds[i]:
            return None
    return (flat_bounds, entry_splits)


@functools.partial(
    memtrace.jit,
    static_argnames=("m", "k", "n", "precision", "splits", "safe",
                     "oh_plans"))
def _alg1_dense_compute(a_indptr, a_indices, a_data,
                        b_indptr, b_indices, b_data,
                        alpha, m: int, k: int, n: int,
                        precision: str = "highest", splits=(None, None),
                        safe: bool = False, oh_plans=(None, None)):
    """Dense value + structural-pattern matmuls; returns (C, mask, nnz).

    Densification: when `oh_plans` carries a static chunk plan per operand
    (see kernels/densify_onehot), the Pallas windowed one-hot MXU kernel
    produces the value matrix and the bf16 structural pattern directly —
    2.2x faster than the XLA scatter and with no explicit-zero marker
    games.  Otherwise one scatter per operand: the value array is the
    marked dense with TINY mapped back to 0; the bf16 pattern is a compare
    of the same array (bf16 0/1 inputs accumulate exactly in the MXU's f32
    for k < 2**24).  With `safe=True` the marker trick is replaced by a
    second 0/1 pattern scatter per operand — required when an input
    legitimately stores the value +TINY (see `_tiny_collision`).

    `precision`: "highest" (bf16x6, fp32-grade, default) | "high" (bf16x3,
    rel err ~5e-7 — inside the reference's own ALG1-vs-ALG3 spread) |
    "default" (single bf16 pass, throughput studies only).  A manual
    bf16-split matmul is deliberately NOT used: TPU toolchains may compile
    with --xla_allow_excess_precision=true, which folds cast-based splits
    into one lossy pass (measured 6e-3 rel error).
    """
    if oh_plans[0] is not None and oh_plans[1] is not None:
        from spmm_tpu.ops.kernels.densify_onehot import densify_onehot

        ad, a_pat = densify_onehot(a_indptr, a_indices, a_data, m, k,
                                   oh_plans[0])
        bd, b_pat = densify_onehot(b_indptr, b_indices, b_data, k, n,
                                   oh_plans[1])
    elif safe:
        ad = _densify_flat(a_indptr, a_indices, a_data, m, k, splits[0])
        bd = _densify_flat(b_indptr, b_indices, b_data, k, n, splits[1])
        a_pat = _densify_flat(
            a_indptr, a_indices, jnp.ones_like(a_data), m, k,
            splits[0]).astype(jnp.bfloat16)
        b_pat = _densify_flat(
            b_indptr, b_indices, jnp.ones_like(b_data), k, n,
            splits[1]).astype(jnp.bfloat16)
    else:
        ad_m = _densify_marked(a_indptr, a_indices, a_data, m, k, splits[0])
        bd_m = _densify_marked(b_indptr, b_indices, b_data, k, n, splits[1])
        tiny = jnp.asarray(_TINY, ad_m.dtype)
        ad = jnp.where(ad_m == tiny, 0, ad_m)
        bd = jnp.where(bd_m == tiny, 0, bd_m)
        a_pat = (ad_m != 0).astype(jnp.bfloat16)
        b_pat = (bd_m != 0).astype(jnp.bfloat16)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[precision]
    c = jnp.dot(ad, bd, preferred_element_type=ad.dtype, precision=prec)
    counts = jnp.dot(a_pat, b_pat, preferred_element_type=jnp.float32)
    mask = counts > 0
    nnz = jnp.sum(mask, dtype=INDEX_DTYPE)
    return alpha * c, mask, nnz


@memtrace.jit
def _tiny_collision(a_data, b_data):
    """True if either operand stores a value equal to the +TINY marker
    (float32 smallest normal) — in that case the marked-densify trick
    would zero it in the value matmul, so the safe path must be used."""
    tiny_a = jnp.asarray(_TINY, a_data.dtype)
    tiny_b = jnp.asarray(_TINY, b_data.dtype)
    return jnp.any(a_data == tiny_a) | jnp.any(b_data == tiny_b)


@functools.partial(memtrace.jit, static_argnames=("m", "n"))
def _extract_full(c, mask, m: int, n: int):
    """Extraction when the output is completely dense (no holes)."""
    indptr = (jnp.arange(m + 1, dtype=INDEX_DTYPE)
              * jnp.asarray(n, INDEX_DTYPE))
    col = jnp.tile(jnp.arange(n, dtype=INDEX_DTYPE), m)
    return indptr, col, c.ravel()


@functools.partial(memtrace.jit, static_argnames=("cap", "g_pad", "m", "n"))
def _extract_shift(c, mask, cap: int, g_pad: int, m: int, n: int):
    """Near-dense extraction by shifted selects — no sort/gather/scatter.

    With g = m*n − cap holes, kept element for output slot t lives at
    source t + j for exactly one j ∈ [0, g]: the j with mask[t+j] set and
    #holes≤(t+j) == j.  For small g this is (g+1) static shifted
    compare-selects over the flat arrays — pure VPU streaming.  g is padded
    to a bucket (g_pad) to bound recompilation.
    """
    mk = m * n
    flat_mask = mask.ravel()
    # hole prefix via triangular MXU matmuls — XLA's cumsum costs log-depth
    # full-array passes at this size (see _primitives.cumsum01_tri).  The
    # mask is folded into the prefix (holes carry -1) and narrowed to i16:
    # the select chain is HBM-bound, so per-pass bytes matter.
    hole_cum = prim.cumsum01_tri(~flat_mask).astype(jnp.int16)
    h2 = jnp.where(flat_mask, hole_cum, jnp.int16(-1))
    # pad so static slices [j : j+cap] stay in range for j ≤ g_pad
    cflat = jnp.concatenate([c.ravel(), jnp.zeros((g_pad,), c.dtype)])
    hpad = jnp.concatenate(
        [h2, jnp.full((g_pad,), -1, jnp.int16)])
    out = jnp.zeros((cap,), c.dtype)
    jmap = jnp.zeros((cap,), jnp.int16)
    for j in range(g_pad + 1):
        cond = hpad[j:j + cap] == jnp.int16(j)
        out = jnp.where(cond, cflat[j:j + cap], out)
        jmap = jnp.where(cond, jnp.int16(j), jmap)
    t = jnp.arange(cap, dtype=INDEX_DTYPE)
    col = (t + jmap.astype(INDEX_DTYPE)) % jnp.asarray(n, INDEX_DTYPE)
    lens = jnp.sum(mask, axis=1, dtype=INDEX_DTYPE)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(lens, dtype=INDEX_DTYPE)])
    return indptr, col, out


@functools.partial(memtrace.jit, static_argnames=("cap", "m", "n"))
def _extract_sort(c, mask, cap: int, m: int, n: int):
    """General extraction: stable-sort compaction (kept elements first, in
    row-major order)."""
    mk = m * n
    keys = jnp.where(mask.ravel(), jnp.int8(0), jnp.int8(1))
    idxs = jnp.arange(mk, dtype=INDEX_DTYPE)
    _, flat_s, val_s = jax.lax.sort((keys, idxs, c.ravel()), num_keys=1,
                                    is_stable=True)
    flat_c = flat_s[:cap]
    lens = jnp.sum(mask, axis=1, dtype=INDEX_DTYPE)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(lens, dtype=INDEX_DTYPE)])
    return indptr, flat_c % jnp.asarray(n, INDEX_DTYPE), val_s[:cap]


def _bucket_holes(g: int) -> int:
    # granularity 8: the select chain costs one HBM pass per shift, so
    # tight buckets beat pow2 (g=33 → 40 passes, not 64); recompile
    # granularity stays bounded
    return max(8, -(-g // 8) * 8)


def _dense_extract(c, mask, nnz: int, m: int):
    """Dispatch extraction by hole count (kept for API compatibility)."""
    from spmm_tpu.ops.kernels.extract_roll import (extract_roll,
                                                   extract_roll_applies)

    n = c.shape[1]
    g = m * n - nnz
    if g == 0:
        return _extract_full(c, mask, m, n)
    g_pad = _bucket_holes(g)
    if (g <= _EXTRACT_ROLL_MAX_HOLES
            and extract_roll_applies(nnz, g_pad, c.dtype)):
        return extract_roll(c, mask, nnz, g_pad, m, n)
    if g <= _SHIFT_EXTRACT_MAX_HOLES:
        return _extract_shift(c, mask, nnz, g_pad, m, n)
    return _extract_sort(c, mask, nnz, m, n)


def alg1_onehot_plans(a, b):
    """Static Pallas densify plans for both operands, or (None, None) when
    the one-hot kernel does not apply (non-TPU backend, non-f32 data, or
    shapes/sparsity outside the kernel's window contract).  Costs one
    indptr readback per matrix — cache alongside `cap` on serving paths."""
    from spmm_tpu.ops.kernels.densify_onehot import densify_onehot_plan

    if jax.default_backend() != "tpu":
        return (None, None)
    if a.dtype != jnp.float32 or b.dtype != jnp.float32:
        return (None, None)
    m, k = a.shape
    n = b.shape[1]
    pa = densify_onehot_plan(np.asarray(a.indptr), m, k)
    pb = densify_onehot_plan(np.asarray(b.indptr), k, n)
    if pa is None or pb is None:
        return (None, None)
    return (pa, pb)


def _spgemm_alg1(a, b, alpha, precision: str = "highest"):
    from spmm_tpu.sparse.csr import CSR

    m, k = a.shape
    n = b.shape[1]
    oh_plans = alg1_onehot_plans(a, b)
    # marker collision check only matters on the scatter fallback
    safe = (oh_plans[0] is None
            and bool(_tiny_collision(a.data, b.data)))
    c, mask, nnz_dev = _alg1_dense_compute(
        a.indptr, a.indices, a.data, b.indptr, b.indices, b.data,
        jnp.asarray(alpha, a.dtype), m, k, n, precision, safe=safe,
        oh_plans=oh_plans)
    nnz = int(nnz_dev)  # host sync — the analogue of spMatGetSize
    indptr, col, data = _dense_extract(c, mask, nnz, m)
    return CSR.from_parts(indptr, col, data, (m, n), canonical=True)


# ===========================================================================
# ALG2 — expand-sort-compress with exact two-phase sizing
# ===========================================================================


@memtrace.jit
def _work_estimation(a_indices, b_indptr):
    """Per-A-entry product counts and their inclusive prefix (symbolic phase).

    The analogue of `spGEMM_workEstimation` (cusparse.py:2086-2092).
    """
    counts = (b_indptr[a_indices + 1] - b_indptr[a_indices]).astype(INDEX_DTYPE)
    ends = jnp.cumsum(counts, dtype=INDEX_DTYPE)
    return counts, ends


@functools.partial(memtrace.jit, static_argnames=("P",))
def _expand(a_rows, a_indices, a_data, b_indptr, b_indices, b_data,
            counts, ends, P: int):
    """Materialise all P partial products as (row, col, val) triplets.

    Expansion order is A-entry order then B-row order — fixed, so downstream
    stable sorts give a deterministic duplicate ordering.

    Per-A-entry quantities (row id, B-row start, segment start, A value) are
    piecewise-constant over each entry's product segment, so they are
    reconstructed by scattering per-entry DELTAS at segment heads and taking
    one cumsum — exact for int32, and exact for f32 via its bit pattern.
    TPU gathers serialise at ~8 ns/element, so this turns five P-sized
    gathers into nnz-sized scatters + cumsums; only the two B-side gathers
    (whose indices advance inside a segment) remain.
    """
    heads = ends - counts  # segment start position of each A entry (p-space)

    def bcast(vals):
        """Piecewise-constant broadcast of per-entry int32 values onto the
        P product slots (Δ-scatter at heads + cumsum; duplicate heads from
        empty segments telescope correctly)."""
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        buf = jnp.zeros((P,), INDEX_DTYPE).at[heads].add(
            deltas, mode="drop")
        return jnp.cumsum(buf, dtype=INDEX_DTYPE)

    p = jnp.arange(P, dtype=INDEX_DTYPE)
    row = bcast(a_rows)
    b_start = bcast(b_indptr[a_indices])      # nnz-sized gather only
    seg_start = bcast(heads)
    b_pos = b_start + (p - seg_start)
    col = b_indices[b_pos]                    # P-sized gather (unavoidable)
    b_val = b_data[b_pos]                     # P-sized gather (unavoidable)
    itemsize = jnp.dtype(a_data.dtype).itemsize
    if itemsize <= 4:
        # exact f-bit broadcast via the value's bit pattern
        # (width-matched int)
        int_t = {2: jnp.int16, 4: jnp.int32}[itemsize]
        a_bits = jax.lax.bitcast_convert_type(
            a_data, int_t).astype(INDEX_DTYPE)
        a_val = jax.lax.bitcast_convert_type(
            bcast(a_bits).astype(int_t), a_data.dtype)
    else:
        # wide dtypes (float64, complex64/128, reference
        # test_cusparse.py:144,373): broadcast the entry id (exact int32)
        # and gather the value — one extra P-sized gather on the
        # correctness path for these dtypes
        nnz = a_rows.shape[0]
        eid = bcast(jnp.arange(nnz, dtype=INDEX_DTYPE))
        a_val = a_data[eid]
    val = a_val * b_val
    return row, col, val


@functools.partial(memtrace.jit, static_argnames=("P", "k"))
def _expand_joined(a_rows, a_indices, a_data, b_indptr, b_indices, b_data,
                   counts, ends, P: int, k: int):
    """Gather-free expansion: all P partial products with ZERO P-sized
    gathers (vs `_expand`'s two serial B-side gathers at ~8 ns/element).

    Key identity: sorting the product slots by their B position `b_pos`
    makes the B-side values piecewise-constant — slot runs reading B
    position q have length cnt_q = #{A entries in column b_rows[q]} — so
    `col` and `b_val` become delta-scatter broadcasts.  The A side rides
    through the sort as payloads.  The stable sort maps A-entry-major
    order to b_pos order; for equal (row, col) duplicates both orders
    coincide (ascending k), so the downstream lexsort + fixed reduction
    tree is BITWISE identical to the `_expand` pipeline.

    Returns (row, col, val) triplets in b_pos order (any fixed order is
    fine: the caller lexsorts by (row, col) next).
    """
    heads = ends - counts

    def bcast(vals, hd, size):
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        buf = jnp.zeros((size,), INDEX_DTYPE).at[hd].add(
            deltas, mode="drop")
        return jnp.cumsum(buf, dtype=INDEX_DTYPE)

    itemsize = jnp.dtype(a_data.dtype).itemsize
    wide = itemsize > 4  # f64/complex: ship entry ids, gather values
    p = jnp.arange(P, dtype=INDEX_DTYPE)
    row1 = bcast(a_rows, heads, P)
    if wide:
        abits1 = bcast(jnp.arange(a_rows.shape[0], dtype=INDEX_DTYPE),
                       heads, P)
    else:
        int_t = {2: jnp.int16, 4: jnp.int32}[itemsize]
        a_bits = jax.lax.bitcast_convert_type(
            a_data, int_t).astype(INDEX_DTYPE)
        abits1 = bcast(a_bits, heads, P)
    b_start = bcast(b_indptr[a_indices], heads, P)   # nnz_a-sized gather
    seg_start = bcast(heads, heads, P)
    b_pos = b_start + (p - seg_start)
    # the join: one stable sort carries the A side into b_pos order
    _, row_s, abits_s = jax.lax.sort(
        (b_pos, row1, abits1), num_keys=1, is_stable=True)
    # B side in sorted order, gather-free
    nnz_b = b_indices.shape[0]
    colcount = jnp.bincount(a_indices, length=k).astype(INDEX_DTYPE)
    cnt = bcast(colcount, b_indptr[:-1], nnz_b)      # per-B-entry run len
    heads2 = jnp.cumsum(cnt, dtype=INDEX_DTYPE) - cnt
    col_s = bcast(b_indices, heads2, P)
    if wide:
        bid_s = bcast(jnp.arange(nnz_b, dtype=INDEX_DTYPE), heads2, P)
        a_val = a_data[abits_s]
        b_val = b_data[bid_s]
    else:
        b_bits = jax.lax.bitcast_convert_type(
            b_data, int_t).astype(INDEX_DTYPE)
        bbits_s = bcast(b_bits, heads2, P)
        a_val = jax.lax.bitcast_convert_type(
            abits_s.astype(int_t), a_data.dtype)
        b_val = jax.lax.bitcast_convert_type(
            bbits_s.astype(int_t), b_data.dtype)
    return row_s, col_s, a_val * b_val


@memtrace.jit
def _compress_count(row_s, col_s):
    return prim.count_unique_sorted(row_s, col_s)


_compact_positions = prim.compact_positions


@functools.partial(memtrace.jit, static_argnames=("nnz_c", "m"))
def _compress(row_s, col_s, val_s, alpha, nnz_c: int, m: int):
    """Sum duplicate (row, col) runs with the fixed doubling tree."""
    P = row_s.shape[0]
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_),
         (row_s[1:] != row_s[:-1]) | (col_s[1:] != col_s[:-1])])
    scanned = prim.segsum_tree(val_s, new_group)
    first_pos = _compact_positions(new_group, nnz_c)
    last_pos = jnp.concatenate(
        [first_pos[1:], jnp.array([P], first_pos.dtype)]) - 1
    out_row = row_s[first_pos]
    out_col = col_s[first_pos]
    out_val = alpha * scanned[last_pos]
    indptr = prim.build_indptr(out_row, m)
    return indptr, out_col, out_val


@functools.partial(memtrace.jit, static_argnames=("P", "m", "n", "k", "joined"))
def _esc_expand_sort_count(a_rows, a_indices, a_data,
                           b_indptr, b_indices, b_data,
                           counts, ends, P: int, m: int, n: int,
                           k: int = 0, joined: bool = False):
    """Fused ESC numeric front half: expand all P partial products,
    stable-lexsort by (row, col), count unique pairs — one device program
    between the two host sizing readbacks.  `joined=True` uses the
    gather-free `_expand_joined` (bitwise-identical output); measured on
    v5e it LOSES to the two-gather `_expand` (90 vs 49 ms at n=1024
    ρ=0.1, P=10.7M): the extra P-sized 3-operand stable sort costs more
    than the two B-side gathers it removes, so gather stays the default."""
    if joined:
        row, col, val = _expand_joined(
            a_rows, a_indices, a_data, b_indptr, b_indices, b_data,
            counts, ends, P, k)
    else:
        row, col, val = _expand(a_rows, a_indices, a_data,
                                b_indptr, b_indices, b_data,
                                counts, ends, P)
    row_s, col_s, (val_s,) = prim.lexsort_rowcol(row, col, (val,), (m, n))
    nnz_c = prim.count_unique_sorted(row_s, col_s)
    return row_s, col_s, val_s, nnz_c


def _spgemm_alg2_esc(a, b, alpha, joined: bool = False):
    from spmm_tpu.sparse.csr import CSR

    m, k = a.shape
    n = b.shape[1]
    if a.nnz == 0 or b.nnz == 0:
        return _empty_csr(m, n, a.dtype)
    counts, ends = _work_estimation(a.indices, b.indptr)
    P = int(ends[-1])  # host sync — sizing readback (workEstimation)
    if P == 0:
        return _empty_csr(m, n, a.dtype)
    row_s, col_s, val_s, nnz_dev = _esc_expand_sort_count(
        a.rows, a.indices, a.data, b.indptr, b.indices, b.data,
        counts, ends, P, m, n, k, joined)
    nnz_c = int(nnz_dev)  # host sync (spMatGetSize)
    indptr, out_col, out_val = _compress(
        row_s, col_s, val_s, jnp.asarray(alpha, a.dtype), nnz_c, m)
    return CSR.from_parts(indptr, out_col, out_val, (m, n), canonical=True)


# ===========================================================================
# ALG3 — chunked ESC (bounded workspace)
# ===========================================================================


@functools.partial(memtrace.jit, static_argnames=("E", "W", "m", "n"))
def _chunk_esc(a_indptr_full, a_indices, a_data, a_rows,
               b_indptr, b_indices, b_data,
               r0, e0, e1, E: int, W: int, m: int, n: int):
    """One ESC pass over A rows [r0, r1) whose entries live in [e0, e1).

    Entries are padded to E, the product workspace to W; invalid lanes carry
    row = m (sorts to the end) and val = 0.  Returns padded sorted triplets
    plus the valid-output count.
    """
    idx = e0 + jnp.arange(E, dtype=INDEX_DTYPE)
    valid_e = idx < e1
    safe = jnp.where(valid_e, idx, 0)
    ai = jnp.where(valid_e, a_indices[safe], 0)
    ad = jnp.where(valid_e, a_data[safe], 0)
    ar = jnp.where(valid_e, a_rows[safe], m)
    counts = jnp.where(
        valid_e, b_indptr[ai + 1] - b_indptr[ai], 0).astype(INDEX_DTYPE)
    ends = jnp.cumsum(counts, dtype=INDEX_DTYPE)
    total = ends[-1]
    p = jnp.arange(W, dtype=INDEX_DTYPE)
    valid_p = p < total
    heads = ends - counts

    def bcast(vals):
        # piecewise-constant broadcast onto product slots (see _expand)
        deltas = jnp.concatenate([vals[:1], vals[1:] - vals[:-1]])
        buf = jnp.zeros((W,), INDEX_DTYPE).at[
            jnp.minimum(heads, W - 1)].add(
                jnp.where(heads < W, deltas, 0), mode="drop")
        return jnp.cumsum(buf, dtype=INDEX_DTYPE)

    b_start = bcast(b_indptr[ai])
    seg_start = bcast(heads)
    within = jnp.where(valid_p, p - seg_start, 0)
    b_pos = jnp.minimum(b_start + within, b_indices.shape[0] - 1)
    b_pos = jnp.maximum(b_pos, 0)
    row = jnp.where(valid_p, bcast(ar), m)
    itemsize = jnp.dtype(ad.dtype).itemsize
    if itemsize <= 4:
        int_t = {2: jnp.int16, 4: jnp.int32}[itemsize]
        a_bits = jax.lax.bitcast_convert_type(
            ad, int_t).astype(INDEX_DTYPE)
        a_val = jax.lax.bitcast_convert_type(
            bcast(a_bits).astype(int_t), ad.dtype)
    else:
        # wide dtypes: entry-id broadcast + gather (see _expand)
        eid = jnp.clip(bcast(jnp.arange(E, dtype=INDEX_DTYPE)), 0, E - 1)
        a_val = ad[eid]
    col = jnp.where(valid_p, b_indices[b_pos], n - 1)
    val = jnp.where(valid_p, a_val * b_data[b_pos], 0)
    # lex sort; invalid lanes (row=m) land at the end
    row_s, col_s, (val_s,) = prim.lexsort_rowcol(row, col, (val,), (m + 1, n))
    new_group = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_),
         (row_s[1:] != row_s[:-1]) | (col_s[1:] != col_s[:-1])])
    valid_s = row_s < m
    nnz_chunk = jnp.sum(new_group & valid_s, dtype=INDEX_DTYPE)
    return row_s, col_s, val_s, new_group, valid_s, nnz_chunk


@functools.partial(memtrace.jit, static_argnames=("nnz_c",))
def _chunk_extract(row_s, col_s, val_s, new_group, valid_s, alpha,
                   nnz_c: int):
    scanned = prim.segsum_tree(val_s, new_group)
    # Valid segments occupy a prefix of the sorted workspace (the invalid
    # sentinel run sorts last), so the first nnz_c segment heads — and the
    # first nnz_c segment tails — are exactly the valid ones.
    first_pos = _compact_positions(new_group, nnz_c)
    last_flags = jnp.concatenate(
        [new_group[1:], jnp.ones((1,), jnp.bool_)])
    last_pos = _compact_positions(last_flags, nnz_c)
    return row_s[first_pos], col_s[first_pos], alpha * scanned[last_pos]


@functools.partial(
    memtrace.jit, static_argnames=("E", "W", "m", "n", "nchunks"))
def _alg3_esc_count(a_indptr, a_indices, a_data, a_rows,
                    b_indptr, b_indices, b_data, r0s, e0s, e1s,
                    E: int, W: int, m: int, n: int, nchunks: int):
    """Sizing scan: one ESC chunk live at a time, per-chunk output counts
    in one program (the workEstimation sweep; round-1 paid one host sync
    per chunk here — VERDICT item 6)."""

    def body(_, i):
        *_, nnz_c = _chunk_esc(a_indptr, a_indices, a_data, a_rows,
                               b_indptr, b_indices, b_data,
                               r0s[i], e0s[i], e1s[i], E, W, m, n)
        return 0, nnz_c

    _, counts = jax.lax.scan(body, 0,
                             jnp.arange(nchunks, dtype=INDEX_DTYPE))
    return counts


@functools.partial(
    memtrace.jit,
    static_argnames=("E", "W", "m", "n", "nchunks", "cap", "total"))
def _alg3_esc_compute(a_indptr, a_indices, a_data, a_rows,
                      b_indptr, b_indices, b_data, r0s, e0s, e1s,
                      counts, alpha, E: int, W: int, m: int, n: int,
                      nchunks: int, cap: int, total: int):
    """Numeric scan: recompute each chunk (the compute sweep — cuSPARSE's
    staged pipeline also runs estimate + compute) and merge the compacted
    outputs at exact offsets with ascending dynamic-update-slices; the
    workspace stays one chunk + the output buffers."""
    offs = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE),
         jnp.cumsum(counts, dtype=INDEX_DTYPE)])
    rowbuf = jnp.full((total + cap,), m, INDEX_DTYPE)
    colbuf = jnp.zeros((total + cap,), INDEX_DTYPE)
    valbuf = jnp.zeros((total + cap,), a_data.dtype)

    def body(bufs, i):
        row_s, col_s, val_s, new_group, valid_s, nnz_c = _chunk_esc(
            a_indptr, a_indices, a_data, a_rows,
            b_indptr, b_indices, b_data,
            r0s[i], e0s[i], e1s[i], E, W, m, n)
        scanned = prim.segsum_tree(val_s, new_group)
        first_pos = _compact_positions(new_group, cap)
        last_flags = jnp.concatenate(
            [new_group[1:], jnp.ones((1,), jnp.bool_)])
        last_pos = _compact_positions(last_flags, cap)
        valid = jnp.arange(cap, dtype=INDEX_DTYPE) < nnz_c
        r = jnp.where(valid, row_s[first_pos], m)
        c = jnp.where(valid, col_s[first_pos], 0)
        v = jnp.where(valid, alpha * scanned[last_pos], 0)
        rb, cb, vb = bufs
        rb = jax.lax.dynamic_update_slice(rb, r, (offs[i],))
        cb = jax.lax.dynamic_update_slice(cb, c, (offs[i],))
        vb = jax.lax.dynamic_update_slice(vb, v, (offs[i],))
        return (rb, cb, vb), ()

    (rowbuf, colbuf, valbuf), _ = jax.lax.scan(
        body, (rowbuf, colbuf, valbuf),
        jnp.arange(nchunks, dtype=INDEX_DTYPE))
    row = rowbuf[:total]
    indptr = prim.build_indptr(jnp.minimum(row, m - 1), m)
    return indptr, colbuf[:total], valbuf[:total]


def _spgemm_alg3_esc(a, b, alpha, chunk_fraction: float,
                     verbose: bool = False):
    from spmm_tpu.sparse.csr import CSR

    m, _ = a.shape
    n = b.shape[1]
    if a.nnz == 0 or b.nnz == 0:
        return _empty_csr(m, n, a.dtype)
    counts, ends = _work_estimation(a.indices, b.indptr)
    P = int(ends[-1])
    if P == 0:
        return _empty_csr(m, n, a.dtype)
    chunk_fraction = min(max(float(chunk_fraction), 1e-3), 1.0)
    target = max(1, int(np.ceil(P * chunk_fraction)))
    # row boundaries balancing products per chunk (host, numpy)
    indptr_h = np.asarray(a.indptr)
    ends_h = np.asarray(ends)
    row_prod_cum = ends_h[np.maximum(indptr_h[1:], 1) - 1]
    row_prod_cum = np.where(indptr_h[1:] > 0, row_prod_cum, 0)
    bounds = [0]
    while bounds[-1] < m:
        tgt = (row_prod_cum[bounds[-1] - 1] if bounds[-1] else 0) + target
        nxt = int(np.searchsorted(row_prod_cum, tgt, side="left")) + 1
        bounds.append(min(max(nxt, bounds[-1] + 1), m))
    a_rows = a.rows
    # static workspace sizes: max entries / products over chunks
    chunk_meta = []
    for r0, r1 in zip(bounds[:-1], bounds[1:]):
        e0, e1 = int(indptr_h[r0]), int(indptr_h[r1])
        pw = int((row_prod_cum[r1 - 1] if r1 > 0 else 0)
                 - (row_prod_cum[r0 - 1] if r0 > 0 else 0))
        chunk_meta.append((r0, r1, e0, e1, pw))
    E = max(max(c[3] - c[2] for c in chunk_meta), 1)
    W = max(max(c[4] for c in chunk_meta), 1)
    nchunks = len(chunk_meta)
    if verbose:
        print(f"[spgemm alg3] P={P} chunks={nchunks} "
              f"E={E} W={W} chunk_fraction={chunk_fraction}")
    alpha_arr = jnp.asarray(alpha, a.dtype)
    r0s = jnp.asarray([c[0] for c in chunk_meta], INDEX_DTYPE)
    e0s = jnp.asarray([c[2] for c in chunk_meta], INDEX_DTYPE)
    e1s = jnp.asarray([c[3] for c in chunk_meta], INDEX_DTYPE)
    counts_c = _alg3_esc_count(
        a.indptr, a.indices, a.data, a_rows,
        b.indptr, b.indices, b.data, r0s, e0s, e1s, E, W, m, n, nchunks)
    counts_h = np.asarray(counts_c)  # ONE sizing readback for all chunks
    total = int(counts_h.sum())
    if total == 0:
        return _empty_csr(m, n, a.dtype)
    cap = min(int(counts_h.max()), W)
    indptr, col, val = _alg3_esc_compute(
        a.indptr, a.indices, a.data, a_rows,
        b.indptr, b.indices, b.data, r0s, e0s, e1s, counts_c, alpha_arr,
        E, W, m, n, nchunks, cap, total)
    return CSR.from_parts(indptr, col, val, (m, n), canonical=True)


# ===========================================================================
# public entry
# ===========================================================================


def _empty_csr(m, n, dtype):
    from spmm_tpu.sparse.csr import CSR

    return CSR.from_parts(jnp.zeros((m + 1,), INDEX_DTYPE),
                          jnp.zeros((0,), INDEX_DTYPE),
                          jnp.zeros((0,), dtype), (m, n), canonical=True)


def _blocked_feasible(a, b) -> bool:
    """Dense-tile strategies apply when A/B dense panels fit the budget
    (the same regime class as alg1's intermediates)."""
    m, k = a.shape
    n = b.shape[1]
    return (4 * (m * k + k * n) <= _DENSE_BUDGET_BYTES
            and (m + 256) * (n + 256) < 2**31)


def spgemm(a, b, alpha=1.0, alg: int = 0, chunk_fraction: float = 0.2,
           verbose: bool = False, precision: str = "highest",
           impl: str = "auto"):
    """C = alpha * A @ B, both CSR.  API mirrors the modified
    `cupyx.cusparse.spgemm` (cusparse.py:2007): alg ∈ {0 (default), 1, 2, 3},
    `chunk_fraction` applies to alg=3.

    `impl` selects the alg2/alg3 engine: "auto" uses the MXU blocked
    dense-intermediate pipelines (ops/spgemm_blocked) when A/B dense
    panels fit the budget and falls back to expand-sort-compress
    otherwise; "dense" / "esc" force one engine.
    """
    from spmm_tpu.sparse.csr import CSR

    if not isinstance(a, CSR) or not isinstance(b, CSR):
        raise TypeError("spgemm expects CSR matrices (csr @ csr), matching "
                        "cusparse.spgemm validation")
    if a.shape[1] != b.shape[0]:
        raise ValueError(f"dimension mismatch: {a.shape} @ {b.shape}")
    if impl not in ("auto", "dense", "esc"):
        raise ValueError(f"unknown impl {impl!r}")
    if a.dtype != b.dtype:
        # the reference casts operands to a common type before staging
        # (cusparse.py:2039 _cast_common_type)
        common = jnp.promote_types(a.dtype, b.dtype)
        a = a.astype(common)
        b = b.astype(common)
    a = a.sum_duplicates()
    b = b.sum_duplicates()
    use_blocked = (impl == "dense"
                   or (impl == "auto" and _blocked_feasible(a, b)))
    if alg in (0, 1):
        m, k = a.shape
        n = b.shape[1]
        dense_bytes = 4 * (m * k + k * n + 2 * m * n)
        if alg == 1 or dense_bytes <= _DENSE_BUDGET_BYTES:
            if verbose:
                print(f"[spgemm] alg1 dense-intermediate ({dense_bytes} B)")
            return _spgemm_alg1(a, b, alpha, precision)
        if verbose:
            print("[spgemm] auto: dense footprint too large → alg2")
        alg = 2
    if alg == 2:
        if use_blocked and a.nnz and b.nnz:
            from spmm_tpu.ops.spgemm_blocked import spgemm_alg2_blocked

            return spgemm_alg2_blocked(a, b, alpha, precision, verbose)
        return _spgemm_alg2_esc(a, b, alpha)
    if alg == 3:
        if use_blocked and a.nnz and b.nnz:
            from spmm_tpu.ops.spgemm_blocked import spgemm_alg3_blocked

            return spgemm_alg3_blocked(a, b, alpha, chunk_fraction,
                                       precision, verbose)
        return _spgemm_alg3_esc(a, b, alpha, chunk_fraction, verbose)
    raise ValueError(f"unknown alg {alg!r} (expected 0, 1, 2 or 3)")


@functools.partial(
    memtrace.jit,
    static_argnames=("m", "k", "n", "cap", "precision", "exact_cap",
                     "splits", "safe", "oh_plans"))
def _alg1_fixed(a_indptr, a_indices, a_data, b_indptr, b_indices, b_data,
                alpha, m: int, k: int, n: int, cap: int,
                precision: str = "highest", exact_cap: bool = True,
                splits=(None, None), safe: bool = False,
                oh_plans=(None, None)):
    """Single-dispatch ALG1 pipeline with a static output capacity.

    The jit-traceable SpGEMM: compute + extract fused into one XLA program,
    output CSR padded to `cap` entries (valid count returned alongside).
    This is the serving-path API — no host sync inside; size the capacity
    once with `spgemm_nnz_estimate`/a warmup call (and optionally the
    Pallas densify plans with `alg1_onehot_plans`) and reuse.
    """
    c, mask, nnz = _alg1_dense_compute(
        a_indptr, a_indices, a_data, b_indptr, b_indices, b_data,
        alpha, m, k, n, precision, splits, safe, oh_plans)
    # The full/shift fast paths infer the hole count from cap and are only
    # valid when cap equals the exact output nnz (exact_cap); a merely
    # sufficient capacity uses the general sort-compaction.
    from spmm_tpu.ops.kernels.extract_roll import (extract_roll,
                                                   extract_roll_applies)

    cap_eff = min(cap, m * n)
    g = m * n - cap_eff
    if exact_cap and g == 0:
        indptr, col, data = _extract_full(c, mask, m, n)
    elif (exact_cap and g <= _EXTRACT_ROLL_MAX_HOLES
            and extract_roll_applies(cap_eff, _bucket_holes(g), c.dtype)):
        indptr, col, data = extract_roll(c, mask, cap_eff,
                                         _bucket_holes(g), m, n)
    elif exact_cap and g <= _SHIFT_EXTRACT_MAX_HOLES:
        indptr, col, data = _extract_shift(c, mask, cap_eff,
                                           _bucket_holes(g), m, n)
    else:
        indptr, col, data = _extract_sort(c, mask, cap_eff, m, n)
    if cap > cap_eff:
        pad = cap - cap_eff
        col = jnp.concatenate([col, jnp.zeros((pad,), INDEX_DTYPE)])
        data = jnp.concatenate([data, jnp.zeros((pad,), data.dtype)])
    # keep the padded container self-consistent even if the caller's cap is
    # smaller than the true nnz (indptr must never exceed len(data))
    indptr = jnp.minimum(indptr, jnp.asarray(cap, INDEX_DTYPE))
    valid = jnp.arange(cap, dtype=INDEX_DTYPE) < nnz
    return indptr, jnp.where(valid, col, 0), jnp.where(valid, data, 0), nnz


def spgemm_fixed(a, b, alpha=1.0, cap: Optional[int] = None,
                 precision: str = "highest", split_scatter: bool = True):
    """Eager wrapper over the single-dispatch pipeline; returns
    (CSR padded to cap, true nnz).  cap defaults to a warmup-sized exact
    capacity.  Inputs are canonicalized (cheap no-op when already
    canonical) — the densify scatters and split plans assume sorted,
    duplicate-free entries, matching the reference spgemm's
    has_canonical_format assertion (cusparse.py:2026-2037)."""
    from spmm_tpu.sparse.csr import CSR

    a = a.sum_duplicates()
    b = b.sum_duplicates()
    exact_cap = cap is None
    oh_plans = alg1_onehot_plans(a, b)
    splits = ((densify_split_plan(a), densify_split_plan(b))
              if split_scatter and oh_plans[0] is None else (None, None))
    m, k = a.shape
    n = b.shape[1]
    safe = (oh_plans[0] is None
            and bool(_tiny_collision(a.data, b.data)))
    if cap is None:
        _, _, nnz_dev = _alg1_dense_compute(
            a.indptr, a.indices, a.data, b.indptr, b.indices, b.data,
            jnp.asarray(alpha, a.dtype), m, k, n, safe=safe,
            oh_plans=oh_plans)
        cap = int(nnz_dev)
    indptr, col, data, nnz = _alg1_fixed(
        a.indptr, a.indices, a.data, b.indptr, b.indices, b.data,
        jnp.asarray(alpha, a.dtype), m, k, n, cap, precision, exact_cap,
        splits, safe, oh_plans)
    nnz_true = int(nnz)
    if nnz_true > cap:
        raise ValueError(
            f"spgemm_fixed: capacity {cap} is smaller than the true output "
            f"nnz {nnz_true}; rerun with cap >= {nnz_true} (or cap=None for "
            "exact sizing)")
    return CSR.from_parts(indptr, col, data, (m, n), canonical=True), nnz


def spgemm_nnz_estimate(a, b) -> Tuple[int, int]:
    """(intermediate products P, upper bound on nnz(C)) — sizing helper.

    Host int64 math: the on-device `_work_estimation` cumsum is
    INDEX_DTYPE (int32) and wraps negative past 2^31 products (hit at
    2048²/0.5 — P ≈ 2.1e9), which poisoned every downstream byte
    estimate."""
    if not a.nnz or not b.nnz:
        return 0, 0
    P = int(np.diff(np.asarray(b.indptr)).astype(np.int64)[
        np.asarray(a.indices)].sum())
    return P, min(P, a.shape[0] * b.shape[1])
