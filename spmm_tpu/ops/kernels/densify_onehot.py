"""Pallas TPU kernel: CSR → dense via windowed two-level one-hot MXU placement.

The TPU-native replacement for the XLA densify scatter on the ALG1 SpGEMM
hot path (the reference rides cuSPARSE's sparse descriptors instead —
/root/reference modify_src/cupy-src/cupyx/cusparse.py:2044-2067; on TPU the
dense intermediate IS the algorithm, so placement speed is the wall).

XLA lowers a CSR→dense scatter to a serial ~6 ns/element loop (measured:
0.62 ms for 105k entries — the round-1 "scatter wall").  This kernel
vectorises placement with compare-generated one-hots contracted on the MXU:

  * entries are processed in sub-chunks of CH, in CSR order; each sub-chunk
    touches a bounded row window [r0, r0+W) (r0 per sub-chunk from a tiny
    host plan — one indptr readback per matrix, cacheable exactly like an
    output capacity);
  * the destination (row, col) is factored as (row, col>>7) × (col&127):
    a combined "window-row × column-block" one-hot EQᵀ (CH, W·KQ) and a
    lane one-hot R (CH, 128), where KQ = k/128;
  * dense window = EQᵀᵀ · (R ⊙ value): MXU contractions over the entry
    dimension instead of CH serial stores.  Lane-op cost is
    CH·(W·KQ + 128) per sub-chunk versus CH·k for a naive one-hot.

U sub-chunks are processed per grid step (static unroll) because Mosaic
charges ~2.5 µs fixed cost per step; entry metadata is packed (CH, U) —
sub-chunk per lane — so VMEM blocks are dense (a (CH, 1) layout pads to
128 lanes and wastes 128x).

Values travel as raw f32 and are split IN-kernel into the exact bf16
triple (hi, mid, lo — mantissa bit-masked, the `_bf16_split3` logic):
each cell receives exactly one entry (canonical CSR), so three bf16
contraction passes reconstruct the f32 value bitwise (hi+mid+lo, fixed
order).  A fourth pass over R alone yields the structural 0/1 pattern,
which keeps explicit zeros — this replaces the _TINY marker trick of the
XLA path entirely.  Entry metadata travels as ONE packed int32
(row·k_pad + col): 8 B/entry streamed in total.

Output layout is (m_pad·KQ, 128) ≡ row-major (m_pad, k), so the caller's
reshape is free.  Deterministic by construction: fixed chunk order, fixed
reduction order, no atomics.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as np

from spmm_tpu.utils import memtrace

INDEX_DTYPE = jnp.int32

# entries per sub-chunk / sub-chunks per grid step.  Cost per entry is
# ~WQ = W*KQ lane/MXU ops per pass, and the window height W shrinks
# with CH down to the store-alignment floor (W=16 at 1024^2/0.1):
# measured on v5e round 3 (job 113, checksum-live): CH=256/U=32 runs
# 0.154 ms vs 0.191 for the round-2 CH=1024/U=16 at the headline
# config; CH=2048 regresses (W=32).
CH_DEFAULT = 256
U_DEFAULT = 32
# plans whose worst sub-chunk spans more rows than this are rejected (the
# matrix is too sparse for the windowed kernel — use the XLA scatter)
W_MAX = 512
# VMEM budget for the resident output buffer(s); the plan gate charges
# out_bytes_per_cell (6 f32+bf16 / 4 value-only / 2 pattern-only).
# 28 MB admits 2048² at every mode (measured v5e r5b: 25.2 MB resident +
# ~13 MB scoped unroll stack fits the 64 MB vmem limit with room); the
# former 10 MB gate silently dropped every 2048² call onto the XLA
# scatter (~6 ns/element serialized).
_VMEM_OUT_BUDGET = 28 * 2**20


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def densify_onehot_plan(indptr_host, m: int, k: int,
                        ch: int = CH_DEFAULT,
                        w_max: int = W_MAX,
                        unroll: int = U_DEFAULT,
                        out_bytes_per_cell: int = 6) -> Optional[tuple]:
    """Static chunk plan from a host copy of indptr.

    Returns (r0s, W, CH, U) — per-sub-chunk aligned window starts, the
    common window height, entries per sub-chunk, sub-chunks per grid step
    — or None when the kernel does not apply (empty matrix, a sub-chunk
    spanning too many rows, or outputs too big for VMEM).

    `out_bytes_per_cell` keys the VMEM-residency gate to what the caller
    will actually materialise: 6 for values+pattern (f32+bf16), 4 for
    `with_pattern=False` value-only calls, 2 for the pattern-only kernel.
    A 6-keyed plan rejected 2048² outright and silently dropped the whole
    engine onto the ~6 ns/element XLA scatter (the r5b 2048-row wall).
    """
    indptr_host = np.asarray(indptr_host)
    nnz = int(indptr_host[-1])
    if nnz == 0:
        return None
    k_pad = _round_up(k, 128)
    kq = k_pad // 128
    align = 16 if kq == 1 else 8
    nchunks = -(-nnz // ch)
    nsteps = -(-nchunks // unroll)
    nchunks = nsteps * unroll
    starts = np.arange(nchunks, dtype=np.int64) * ch
    ends = np.maximum(np.minimum(starts + ch, nnz) - 1, 0)
    starts_c = np.minimum(starts, nnz - 1)
    row_s = np.searchsorted(indptr_host, starts_c, side="right") - 1
    row_e = np.searchsorted(indptr_host, ends, side="right") - 1
    r0 = (row_s // align) * align
    span = int((row_e - r0 + 1).max())
    # W·KQ must be a multiple of 16 (bf16 sublane tile) and W a multiple
    # of the alignment so dynamic stores stay tile-aligned
    w = _round_up(span, align)
    while (w * kq) % 16:
        w += align
    if w > w_max:
        return None
    # Clamp window starts so every window fits inside the aligned output
    # height m_out = max(round_up(m, align), w): the buffer then has NO
    # tail padding past round_up(m, align), so the caller's [:m] slice is
    # a no-op at aligned m and XLA never materializes a second dense copy
    # (the r5 "co-live at the slice" 2x transient).  Moving a window down
    # keeps its entries in range: row_e <= m-1 <= m_out-1 = r0'+w-1, and
    # the store offset is absolute (r0·KQ + (wq − r0·KQ)), so outputs are
    # bitwise unchanged.
    m_out = max(_round_up(m, align), w)
    r0 = np.minimum(r0, m_out - w)
    if m_out * k_pad * out_bytes_per_cell > _VMEM_OUT_BUDGET:
        return None
    # scoped-stack estimate for the U-way unrolled body: per sub-chunk the
    # live bf16 temporaries are EQᵀ (CH, W·KQ), R (CH, 128) and the three
    # masked value operands (CH, 128); Mosaic keeps all U alive (measured
    # 17.7 MB at 512²/0.5).  Reject plans past the raised 64 MB limit.
    if unroll * ch * (w * kq + 4 * 128) * 2 > 56 * 2**20:
        return None
    return (tuple(int(x) for x in r0), w, ch, unroll)


# Entry metadata travels as ONE packed int32 stream: meta = row·k_pad +
# col  ≡  wq·128 + collo (wq = row·KQ + col>>7, collo = col&127).  The
# kernels decode with a shift/mask, and the f32 values are split into
# the exact bf16 (hi, mid, lo) triple IN-kernel (same mantissa bit-masks
# as `_primitives._bf16_split3`).  This streams 8 B/entry instead of the
# former 14 (wq i32 + collo i32 + 3 bf16 planes): −6 B/entry of both HBM
# traffic and co-live argument buffers (the r5c ~25 MB of alg1's peak at
# 2048²/0.5).


def _decode(meta_col, r0, *, WQ: int, KQ: int, CH: int):
    wq = (meta_col >> 7) - r0 * KQ
    eq_t = (wq == lax.broadcasted_iota(INDEX_DTYPE, (CH, WQ), 1)
            ).astype(jnp.bfloat16)
    rohb = ((meta_col & 127)
            == lax.broadcasted_iota(INDEX_DTYPE, (CH, 128), 1)
            ).astype(jnp.bfloat16)
    return eq_t, rohb


def _split3(v):
    bits = lax.bitcast_convert_type(v, jnp.int32)
    hi = lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    r1 = v - hi
    bits1 = lax.bitcast_convert_type(r1, jnp.int32)
    mid = lax.bitcast_convert_type(bits1 & jnp.int32(-65536), jnp.float32)
    lo = r1 - mid
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            lo.astype(jnp.bfloat16))


def _value_acc(eq_t, rohb, v):
    hi, mid, lo = _split3(v)

    def mm(f):
        # contract the entry (sublane) dim of both: EQᵀᵀ @ F
        return lax.dot_general(eq_t, f, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    return (mm(rohb * hi) + mm(rohb * mid)) + mm(rohb * lo)


def _kernel(r0s_ref, meta_ref, vals_ref, out_ref, pat_ref, *, WQ: int,
            KQ: int, CH: int, U: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        pat_ref[...] = jnp.zeros_like(pat_ref)

    for j in range(U):  # static unroll over the lane-packed sub-chunks
        r0 = r0s_ref[i * U + j]
        eq_t, rohb = _decode(meta_ref[:, j:j + 1], r0, WQ=WQ, KQ=KQ, CH=CH)
        acc = _value_acc(eq_t, rohb, vals_ref[:, j:j + 1])
        patc = lax.dot_general(eq_t, rohb, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        s = pl.multiple_of(r0 * KQ, 8 * KQ)
        out_ref[pl.ds(s, WQ), :] += acc
        pat_ref[pl.ds(s, WQ), :] += patc.astype(jnp.bfloat16)


def _kernel_val(r0s_ref, meta_ref, vals_ref, out_ref, *, WQ: int,
                KQ: int, CH: int, U: int):
    """`_kernel` without the structural-pattern output: one fewer MXU
    pass and no bf16 pattern store/buffer — for consumers that carry
    the structure separately (alg2's numeric phase receives the mask
    from the count program, r5)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for j in range(U):
        r0 = r0s_ref[i * U + j]
        eq_t, rohb = _decode(meta_ref[:, j:j + 1], r0, WQ=WQ, KQ=KQ, CH=CH)
        acc = _value_acc(eq_t, rohb, vals_ref[:, j:j + 1])
        s = pl.multiple_of(r0 * KQ, 8 * KQ)
        out_ref[pl.ds(s, WQ), :] += acc


def _kernel_pat(r0s_ref, meta_ref, pat_ref, *, WQ: int, KQ: int,
                CH: int, U: int):
    """Pattern-only variant: ONE MXU pass per sub-chunk (vs 4 in
    `_kernel`) and no value streams at all — for the symbolic/count
    phase, which only consumes the bf16 structural 0/1 dense."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        pat_ref[...] = jnp.zeros_like(pat_ref)

    for j in range(U):
        r0 = r0s_ref[i * U + j]
        eq_t, rohb = _decode(meta_ref[:, j:j + 1], r0, WQ=WQ, KQ=KQ, CH=CH)
        patc = lax.dot_general(eq_t, rohb, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
        s = pl.multiple_of(r0 * KQ, 8 * KQ)
        pat_ref[pl.ds(s, WQ), :] += patc.astype(jnp.bfloat16)


@functools.partial(
    memtrace.jit, static_argnames=("m", "k", "plan", "interpret"))
def densify_onehot_pattern(indptr, indices, m: int, k: int, plan,
                           interpret: bool = False):
    """bf16 structural 0/1 dense (m, k) from CSR structure — the
    pattern-only entry point (`_pattern_dense` scatter replacement for
    the count programs).  `plan` from `densify_onehot_plan` with
    out_bytes_per_cell=2."""
    from spmm_tpu.ops import _primitives as prim

    r0s_t, W, CH, U = plan
    nchunks = len(r0s_t)
    nsteps = nchunks // U
    k_pad = _round_up(k, 128)
    KQ = k_pad // 128
    WQ = W * KQ
    align = 16 if KQ == 1 else 8
    m_pad = max(_round_up(m, align), W)
    nnz = indices.shape[0]
    n_pad_total = nchunks * CH

    rows = prim.rows_from_indptr(indptr, nnz)
    meta = rows * jnp.asarray(k_pad, INDEX_DTYPE) + indices

    pad = n_pad_total - nnz
    if pad:
        meta = jnp.concatenate(
            [meta, jnp.full((pad,), m * k_pad, INDEX_DTYPE)])

    meta = _pack_lanes(meta, nsteps, U, CH)
    r0s = jnp.asarray(r0s_t, INDEX_DTYPE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i, r0s: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((m_pad * KQ, 128), lambda i, r0s: (0, 0)),
        ],
    )
    (pat,) = pl.pallas_call(
        functools.partial(_kernel_pat, WQ=WQ, KQ=KQ, CH=CH, U=U),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((m_pad * KQ, 128), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(r0s, meta)
    return pat.reshape(m_pad, k_pad)[:m, :k]


def _pack_lanes(x, nsteps: int, U: int, CH: int):
    """(nsteps*U*CH,) → (nsteps*CH, U): sub-chunk index on lanes."""
    return x.reshape(nsteps, U, CH).transpose(0, 2, 1).reshape(
        nsteps * CH, U)


@functools.partial(
    memtrace.jit,
    static_argnames=("m", "k", "plan", "interpret", "with_pattern"))
def densify_onehot(indptr, indices, data, m: int, k: int, plan,
                   interpret: bool = False, with_pattern: bool = True):
    """Dense (m, k) f32 values + (m, k) bf16 structural 0/1 pattern from a
    canonical CSR.  `plan` comes from `densify_onehot_plan` (static).
    `with_pattern=False` runs the value-only kernel (one fewer MXU pass,
    no pattern buffer) and returns (values, None)."""
    from spmm_tpu.ops import _primitives as prim

    r0s_t, W, CH, U = plan
    nchunks = len(r0s_t)
    nsteps = nchunks // U
    k_pad = _round_up(k, 128)
    KQ = k_pad // 128
    WQ = W * KQ
    # aligned output height — matches the plan's window-clamp rule, so
    # the [:m] slice below is a no-op whenever m is already aligned
    align = 16 if KQ == 1 else 8
    m_pad = max(_round_up(m, align), W)
    nnz = data.shape[0]
    n_pad_total = nchunks * CH

    rows = prim.rows_from_indptr(indptr, nnz)
    meta = rows * jnp.asarray(k_pad, INDEX_DTYPE) + indices
    vals = data.astype(jnp.float32)

    pad = n_pad_total - nnz
    if pad:
        meta = jnp.concatenate(
            [meta, jnp.full((pad,), m * k_pad, INDEX_DTYPE)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.float32)])

    meta = _pack_lanes(meta, nsteps, U, CH)
    vals = _pack_lanes(vals, nsteps, U, CH)
    r0s = jnp.asarray(r0s_t, INDEX_DTYPE)

    nouts = 2 if with_pattern else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i, r0s: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r0s: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((m_pad * KQ, 128), lambda i, r0s: (0, 0)),
        ] * nouts,
    )
    kern = _kernel if with_pattern else _kernel_val
    outs = pl.pallas_call(
        functools.partial(kern, WQ=WQ, KQ=KQ, CH=CH, U=U),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m_pad * KQ, 128), jnp.float32),
            jax.ShapeDtypeStruct((m_pad * KQ, 128), jnp.bfloat16),
        ][:nouts],
        # the U-way unrolled body's one-hot temporaries can exceed the
        # default 16 MB scoped-VMEM stack at dense configs (observed at
        # 512²/0.5: 17.7 MB); v5e has 128 MB of VMEM — raise the limit
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(r0s, meta, vals)
    val = outs[0].reshape(m_pad, k_pad)[:m, :k]
    if not with_pattern:
        return val, None
    patm = outs[1].reshape(m_pad, k_pad)[:m, :k]
    return val, patm
