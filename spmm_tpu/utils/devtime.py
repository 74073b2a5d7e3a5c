"""Replay-based device timing for multi-program ops (two-K slope).

The dev relay charges a fluctuating ~2-30 ms per *program call* (tunnel
dispatch + host sync), so eager per-call timing of a sub-10 ms op
measures the tunnel, not the hardware.  The repo's protocol (bench.py,
CLAUDE.md) runs K pipeline iterations inside ONE ``lax.scan`` program
with an integer-checksum feedback XLA cannot fold, and takes the slope
between a K1- and a K2-iteration loop — per-call overhead cancels
exactly.

This module generalises that protocol to ANY op whose device programs
are decorated with :func:`spmm_tpu.utils.memtrace.jit` (all SpGEMM /
SpMV engines are): record the op's top-level programs once with
``memtrace.trace``, then :func:`slope_ms` replays the recorded
(program, args) sequence inside a scan.  Between programs and across
iterations a checksum of EVERY output array is folded into a
perturbation of the next program's first array input, so no program is
loop-invariant (nothing can be hoisted or dead-coded) and the chain is
strictly serialized the way per-call dispatch would be.

What this measures: the device time of the op's *jitted pipeline* — the
cuSPARSE-style count/compute program sequence.  Host-side planning
(sizing readbacks already hoisted per structure, numpy structural
products) is a per-structure cost; report it separately
(``host_plan_s``) where it matters.
"""

from __future__ import annotations

import statistics
import time
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from . import memtrace

_SENTINEL = 123456789  # never equal to a real checksum by construction


def _int_view(x):
    """Bitwise integer view of an array for checksumming (None = skip)."""
    if not (hasattr(x, "dtype") and hasattr(x, "shape")):
        return None
    try:
        size = 1
        for d in x.shape:
            size *= int(d)
    except TypeError:
        return None
    if size == 0:
        return None
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        x = lax.real(x)
    if jnp.issubdtype(x.dtype, jnp.floating):
        nbits = jnp.dtype(x.dtype).itemsize * 8
        return lax.bitcast_convert_type(
            x, {16: jnp.int16, 32: jnp.int32, 64: jnp.int64}[nbits])
    if x.dtype == jnp.bool_:
        return x.astype(jnp.int32)
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x
    return None


def _checksum(leaves, chk):
    for x in leaves:
        xi = _int_view(x)
        if xi is None:
            continue
        chk = jnp.bitwise_xor(chk, jnp.sum(xi.astype(jnp.int32)))
    return chk


def _pick_perturb_leaves(leaves) -> list:
    """Indices of the input leaves to perturb: EVERY float jax.Array
    (else every int jax.Array).  Perturbing a single small leaf is not
    enough — when only a scalar alpha depended on the checksum, XLA's
    loop-invariant code motion hoisted the entire densify+matmul chain
    out of the replay scan and the 2048² alg1 cell read 0.05 ms (round
    4, job 008).  The perturbing add costs one elementwise pass over
    each float input per iteration — the pipeline already reads each of
    them at least once, so the distortion is bounded by ~1 extra input
    stream.  Static arguments are plain Python values / hashables,
    never jax.Array — so chosen leaves are always dynamic arguments."""
    floats = []
    ints = []
    for i, x in enumerate(leaves):
        if not isinstance(x, jax.Array) or x.size == 0:
            continue
        if jnp.issubdtype(x.dtype, jnp.inexact):
            floats.append(i)
        elif jnp.issubdtype(x.dtype, jnp.integer):
            ints.append(i)
    return floats if floats else ints


# Measurement-bias note (ADVICE r4): perturbing every float input adds
# one elementwise add per input per iteration.  Upper bound on the bias:
# one extra HBM read+write pass over each perturbed input (~2.4 µs/GB/ms
# of table at 819 GB/s).  In practice the bias is usually far smaller:
# the whole replay chain inlines into ONE XLA program, so the perturbing
# add fuses into the consumer's first read of that input wherever the
# consumer streams it (no separate pass materialises).  This is also why
# calibrate-and-subtract of a perturb-only scan would OVER-correct — a
# perturb-only loop has no consumer to fuse into, so it prices the adds
# at their unfused worst case.  For bandwidth-bound kernels where the
# distinction matters (routed SpMV streams ~6-7 B/slot), treat reported
# slopes as an upper bound that is at most one input-stream too high.


def _perturbed(x, chk):
    flag = chk == jnp.int32(_SENTINEL)
    if jnp.issubdtype(x.dtype, jnp.inexact):
        eps = jnp.asarray(1e-30, jnp.float32).astype(x.dtype)
        return x + jnp.where(flag, eps, jnp.zeros((), x.dtype))
    return x + jnp.where(flag, 1, 0).astype(x.dtype)


def replay_step(records: Sequence[memtrace.ProgramRecord]):
    """Build ``step(chk) -> chk`` executing every recorded program with
    checksum-chained inputs (see module docstring)."""
    preps = []
    for rec in records:
        leaves, treedef = jax.tree_util.tree_flatten((rec.args, rec.kwargs))
        idxs = _pick_perturb_leaves(leaves)
        preps.append((rec, leaves, treedef, idxs))

    def step(chk):
        for rec, leaves, treedef, idxs in preps:
            lv = list(leaves)
            for idx in idxs:
                lv[idx] = _perturbed(lv[idx], chk)
            args, kwargs = jax.tree_util.tree_unflatten(treedef, lv)
            out = rec.jitted(*args, **kwargs)
            chk = _checksum(jax.tree_util.tree_leaves(out), chk)
        return chk

    return step


def slope_ms(records: Sequence[memtrace.ProgramRecord],
             k1: int = 100, k2: int = 500, reps: int = 5,
             warmup: int = 1) -> float:
    """Two-K-slope device ms per replay of the recorded program chain."""
    if not records:
        raise ValueError("no programs recorded — is the op memtrace-jitted?")
    step = replay_step(records)

    def make(K):
        @jax.jit
        def loop(chk0):
            def body(c, _):
                return step(c), ()

            c, _ = lax.scan(body, chk0, None, length=K)
            return c

        return loop

    l1, l2 = make(k1), make(k2)
    c0 = jnp.int32(7)
    for _ in range(max(warmup, 1)):
        jax.block_until_ready(l1(c0))
        jax.block_until_ready(l2(c0))
    def run_reps(nreps):
        slopes = []
        for _ in range(nreps):
            t0 = time.perf_counter()
            jax.block_until_ready(l1(c0))
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            jax.block_until_ready(l2(c0))
            t2 = time.perf_counter() - t0
            slopes.append((t2 - t1) * 1e3 / (k2 - k1))
        return statistics.median(slopes)

    ms = run_reps(reps)
    if ms <= 0.0:
        # a non-positive slope is physically impossible — it means the
        # relay's per-call overhead spiked by more than the whole
        # (k2-k1)·t_iter during the run; retry once with more reps
        ms = run_reps(2 * reps + 1)
    return ms


def op_device_ms(op, *args, k1: int = 100, k2: int = 500, reps: int = 5,
                 **kwargs):
    """Record ``op(*args, **kwargs)`` once, then two-K-slope replay its
    program chain.  Returns ``(ms, info)`` where info carries the record
    names and the one-shot host wall (plan-time cost, tunnel-inflated)."""
    t0 = time.perf_counter()
    with memtrace.trace() as records:
        result = op(*args, **kwargs)
        jax.block_until_ready(jax.tree_util.tree_leaves(result))
    host_wall = time.perf_counter() - t0
    ms = slope_ms(records, k1=k1, k2=k2, reps=reps)
    return ms, {"programs": [r.name for r in records],
                "one_shot_wall_s": host_wall,
                "result": result}
