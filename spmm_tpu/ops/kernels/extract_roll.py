"""Pallas TPU kernel: near-dense extraction by per-tile dynamic rolls.

Replaces `ops.spgemm._extract_shift`'s (g+1)-pass shifted select chain
(one HBM pass per shift — ~0.3 ms at the n=1024 rho=0.1 headline, g=33)
with a single streaming pass: each output tile loads its source window
once into VMEM and resolves its kept elements with a `lax.fori_loop`
over ONLY the shifts that occur inside the tile (j in [j0_t, j1_t] —
usually one iteration, since holes are sparse).  Work drops from
O(cap * g) HBM traffic to O(cap) + O(holes) VMEM ops.

Layout: the flat (row-major) dense product is tiled into (B, 128)
output blocks; each grid step reads blocks i and i+1 of the source
(2B*128 elements starting at the OUTPUT offset — valid because the
source position of output t is t + j with j <= g < B*128, the plan
constraint).  The shifted view for a dynamic j is built with
`pltpu.roll` (dynamic sublane + lane rolls with a one-row carry select),
the TPU analogue of the select chain's static slices.

The per-tile shift bounds j0/j1 come from the hole prefix (already
computed for the select chain) sampled at tile boundaries — a tiny
strided gather, no host sync.

Exactness: pure data movement (output values are bitwise the dense
values), identical output to `_extract_shift` including the jmap used
for column reconstruction.

Reference parity: this is the TPU-native replacement for the CSR
compression step of cuSPARSE's SpGEMM copy phase
(/root/reference/modify_src/cupy-src/cupyx/cusparse.py:2107-2137).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from spmm_tpu.utils import memtrace
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INDEX_DTYPE = jnp.int32


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def extract_roll_applies(cap: int, g_pad: int, dtype) -> bool:
    """Static applicability: f32 on TPU, with the no-wrap plan constraint
    g < B*128 for the B the plan would choose.  The select chain keeps
    small-g and small-output cases.  Measured on v5e round 3 (jobs
    107-110, checksum-live protocol): standalone at 1M/g=33 roll wins
    (0.128 vs 0.21 ms, bitwise identical) and at g=513 wins 4.8x;
    inside the alg1 pipeline the choice is NEUTRAL (extraction overlaps
    the matmul/densify chain: removing it entirely changes the
    pipeline < 1% — round 2's "0.74 vs 0.62 in-pipeline" comparison
    was measuring a loop whose extraction had been algebraically
    folded away).  At 512^2/g=100 roll loses standalone (33 vs 2 us:
    grid overhead dwarfs the tiny problem).  So: large outputs, and
    enough holes to beat the per-pass chain."""
    if dtype != jnp.float32:
        return False
    if jax.default_backend() != "tpu":
        return False
    B = _pick_b(cap)
    if g_pad >= B * 128:
        return False
    return cap >= (1 << 19) and g_pad >= 32


def _pick_b(cap: int) -> int:
    # large tiles amortize Mosaic's ~2.5 us/step; small caps shrink B so
    # the padded grid does not dwarf the problem
    b = max(16, min(512, _round_up(-(-cap // 128), 16)))
    return b


def _shifted_view(src, kq, kl, s_l, lane, B: int):
    """src (2B, 128) flat row-major; return (B, 128) view of the flat
    shift by j = 128*kq + kl: view[r, l] = src_flat[128*r + l + j]."""
    nb = src.shape[0]
    rq = pltpu.roll(src, lax.rem(jnp.int32(nb) - kq, jnp.int32(nb)),
                    axis=0)[:B + 8, :]
    b1 = pltpu.roll(rq, s_l, axis=1)
    b2 = jnp.concatenate([b1[1:], b1[:1]], axis=0)
    return jnp.where(lane < 128 - kl, b1[:B], b2[:B])


def _kernel(j0s_ref, njs_ref, c0_ref, c1_ref, h0_ref, h1_ref,
            out_ref, jm_ref, *, B: int):
    i = pl.program_id(0)
    src_c = jnp.concatenate([c0_ref[...], c1_ref[...]], axis=0)
    src_h = jnp.concatenate([h0_ref[...], h1_ref[...]],
                            axis=0).astype(jnp.int32)
    j0 = j0s_ref[i]
    nj = njs_ref[i]
    lane = lax.broadcasted_iota(jnp.int32, (B, 128), 1)

    def body(dj, carry):
        out, jm = carry
        j = j0 + dj
        kq = j >> 7
        kl = j & 127
        s_l = lax.rem(jnp.int32(128) - kl, jnp.int32(128))
        cv = _shifted_view(src_c, kq, kl, s_l, lane, B)
        hv = _shifted_view(src_h, kq, kl, s_l, lane, B)
        cond = hv == j
        return (jnp.where(cond, cv, out),
                jnp.where(cond, j, jm))

    out0 = jnp.zeros((B, 128), src_c.dtype)
    jm0 = jnp.zeros((B, 128), jnp.int32)
    out, jm = lax.fori_loop(0, nj, body, (out0, jm0))
    out_ref[...] = out
    jm_ref[...] = jm


@functools.partial(memtrace.jit,
                   static_argnames=("cap", "g_pad", "m", "n", "interpret"))
def extract_roll(c, mask, cap: int, g_pad: int, m: int, n: int,
                 interpret: bool = False):
    """CSR (indptr, col, data) of the `cap` kept elements of dense `c`
    under `mask`, in row-major order — the Pallas replacement for
    `_extract_shift` (bit-identical outputs)."""
    from spmm_tpu.ops import _primitives as prim

    mk = m * n
    B = _pick_b(cap)
    BE = B * 128
    assert g_pad < BE, "extract_roll plan constraint violated"
    ntiles = max(1, -(-cap // BE))

    flat_mask = mask.ravel()
    hole_cum = prim.cumsum01_tri(~flat_mask).astype(jnp.int16)
    h2 = jnp.where(flat_mask, hole_cum, jnp.int16(-1))

    rows_pad = (ntiles + 1) * B
    pad = rows_pad * 128 - mk
    cflat = jnp.concatenate([c.ravel(), jnp.zeros((pad,), c.dtype)])
    hflat = jnp.concatenate([h2, jnp.full((pad,), -1, jnp.int16)])
    c2 = cflat.reshape(rows_pad, 128)
    h2d = hflat.reshape(rows_pad, 128)

    # per-tile shift bounds from the hole prefix (tiny strided gathers)
    t0s = jnp.arange(ntiles, dtype=INDEX_DTYPE) * BE
    hc32 = hole_cum.astype(INDEX_DTYPE)
    j0s = jnp.where(t0s > 0, hc32[jnp.maximum(t0s - 1, 0)], 0)
    j1s = hc32[jnp.minimum(t0s + BE - 1 + g_pad, mk - 1)]
    njs = jnp.maximum(j1s - j0s + 1, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i, 0)),
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i + 1, 0)),
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i, 0)),
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i + 1, 0)),
        ],
        out_specs=[
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i, 0)),
            pl.BlockSpec((B, 128), lambda i, j0, nj: (i, 0)),
        ],
    )
    out, jm = pl.pallas_call(
        functools.partial(_kernel, B=B),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ntiles * B, 128), c.dtype),
            jax.ShapeDtypeStruct((ntiles * B, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(j0s, njs, c2, c2, h2d, h2d)

    vals = out.reshape(ntiles * BE)[:cap]
    jmap = jm.reshape(ntiles * BE)[:cap]
    t = jnp.arange(cap, dtype=INDEX_DTYPE)
    col = (t + jmap) % jnp.asarray(n, INDEX_DTYPE)
    lens = jnp.sum(mask, axis=1, dtype=INDEX_DTYPE)
    indptr = jnp.concatenate(
        [jnp.zeros((1,), INDEX_DTYPE), jnp.cumsum(lens, dtype=INDEX_DTYPE)])
    return indptr, col, vals
