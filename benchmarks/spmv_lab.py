#!/usr/bin/env python
"""SpMV strategy lab (round 3): attribute the one-hot kernel's ~2 ns/entry
and race it against Mosaic lane-gather (`take_along_axis` axis=1) variants.

Run through benchmarks/tpu_worker.py; every number is in-scan with
trivial-scan overhead subtraction (the dev relay charges ~32 ms/call).
"""

import functools
import statistics
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402
from spmm_tpu.ops.kernels import spmv_onehot as so  # noqa: E402

INDEX = jnp.int32
K_INNER = 200
REPS = 5


def _calibrate():
    @jax.jit
    def trivial(x):
        def body(c, _):
            return c * 1.0000001, ()
        cf, _ = lax.scan(body, x, None, length=K_INNER)
        return cf

    jax.block_until_ready(trivial(jnp.float32(1.0)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(trivial(jnp.float32(1.0)))
        ts.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(ts)


_OVERHEAD = None


def bench_scan(name, make_body, carry0, nnz=None):
    """make_body(carry) -> new carry (f32 array, data-chained)."""
    global _OVERHEAD
    if _OVERHEAD is None:
        _OVERHEAD = _calibrate()

    @jax.jit
    def loop(c0):
        def body(c, _):
            return make_body(c), ()
        cf, _ = lax.scan(body, c0, None, length=K_INNER)
        return cf

    jax.block_until_ready(loop(carry0))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(carry0))
        ts.append(((time.perf_counter() - t0) * 1e3 - _OVERHEAD) / K_INNER)
    med = statistics.median(ts)
    extra = f"  {med * 1e6 / nnz:8.2f} ns/nnz = {nnz / med / 1e6:7.3f} Gnnz/s" if nnz else ""
    print(f"  {name:<44s} {med:9.4f} ms{extra}", flush=True)
    return med


# ---------------------------------------------------------------------------
# instrumented variants of the one-hot kernel (gather-only / reduce-only)
# ---------------------------------------------------------------------------

def _kernel_mode(r0s_ref, rows_ref, colq_ref, coll_ref, vals_ref,
                 x3_ref, y_ref, *, W, KQ, KQP, CH, U, mode):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        y_ref[...] = jnp.zeros_like(y_ref)

    for j in range(U):
        if mode in ("full", "gather_only", "full_fat", "gather_fat"):
            lane_oh = (coll_ref[:, j:j + 1]
                       == lax.broadcasted_iota(INDEX, (CH, 128), 1)
                       ).astype(jnp.bfloat16)

            if mode.endswith("_fat"):
                # one fat MXU pass; split-sum + q-select on the result
                pf = jnp.dot(lane_oh, x3_ref[...],
                             preferred_element_type=jnp.float32)
                p = (pf[:, :KQ] + pf[:, KQP:KQP + KQ]
                     + pf[:, 2 * KQP:2 * KQP + KQ])
            else:
                def pdot(sl_q, lane_oh=lane_oh):
                    return jnp.dot(lane_oh, x3_ref[:, sl_q],
                                   preferred_element_type=jnp.float32)

                p = ((pdot(slice(0, KQ)) + pdot(slice(KQP, KQP + KQ)))
                     + pdot(slice(2 * KQP, 2 * KQP + KQ)))
            qmask = (colq_ref[:, j:j + 1]
                     == lax.broadcasted_iota(INDEX, (CH, KQ), 1))
            xval = jnp.sum(jnp.where(qmask, p, 0.0), axis=1, keepdims=True)
            z = vals_ref[:, j:j + 1] * xval
        else:
            z = vals_ref[:, j:j + 1]

        if mode in ("full", "full_fat", "reduce_only"):
            bits = lax.bitcast_convert_type(z, jnp.int32)
            zhi = lax.bitcast_convert_type(bits & jnp.int32(-65536),
                                           jnp.float32)
            r1 = z - zhi
            bits1 = lax.bitcast_convert_type(r1, jnp.int32)
            zmid = lax.bitcast_convert_type(bits1 & jnp.int32(-65536),
                                            jnp.float32)
            zlo = r1 - zmid
            r0 = r0s_ref[i * U + j]
            eq_t = ((rows_ref[:, j:j + 1] - r0)
                    == lax.broadcasted_iota(INDEX, (CH, W), 1)
                    ).astype(jnp.bfloat16)

            def ydot(zz, eq_t=eq_t):
                return lax.dot_general(
                    eq_t, zz.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            y_win = (ydot(zhi) + ydot(zmid)) + ydot(zlo)
            s = pl.multiple_of(r0, 8)
            y_ref[pl.ds(s, W), :] += y_win
        else:
            ones = jnp.ones((8, CH), jnp.bfloat16)
            acc = lax.dot_general(ones, z.astype(jnp.bfloat16),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            y_ref[pl.ds(0, 8), :] += acc


@functools.partial(jax.jit,
                   static_argnames=("m", "n", "plan", "mode"))
def spmv_mode(indptr, indices, data, x, m, n, plan, mode):
    r0s_t, W, CH, U = plan
    nchunks = len(r0s_t)
    nsteps = nchunks // U
    n_pad = so._round_up(n, 128)
    KQ = n_pad // 128
    m_pad = m + W
    nnz = data.shape[0]
    np_total = nchunks * CH

    rows = prim.rows_from_indptr(indptr, nnz)
    colq = indices >> 7
    coll = indices & 127
    vals = data.astype(jnp.float32)
    pad = np_total - nnz
    if pad:
        rows = jnp.concatenate([rows, jnp.full((pad,), m, INDEX)])
        colq = jnp.concatenate([colq, jnp.zeros((pad,), INDEX)])
        coll = jnp.concatenate([coll, jnp.zeros((pad,), INDEX)])
        vals = jnp.concatenate([vals, jnp.zeros((pad,), jnp.float32)])

    xp = x.astype(jnp.float32)
    if n_pad != n:
        xp = jnp.concatenate([xp, jnp.zeros((n_pad - n,), jnp.float32)])
    KQP = so._round_up(KQ, 128)
    xt = xp.reshape(KQ, 128).T
    xhi, xmid, xlo = prim._bf16_split3(xt)

    def _padkq(a):
        if KQP != KQ:
            return jnp.concatenate(
                [a, jnp.zeros((128, KQP - KQ), jnp.bfloat16)], axis=1)
        return a

    x3 = jnp.concatenate([_padkq(xhi), _padkq(xmid), _padkq(xlo)], axis=1)

    rows = so._pack_lanes(rows, nsteps, U, CH)
    colq = so._pack_lanes(colq, nsteps, U, CH)
    coll = so._pack_lanes(coll, nsteps, U, CH)
    vals = so._pack_lanes(vals, nsteps, U, CH)
    r0s = jnp.asarray(r0s_t, INDEX)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((CH, U), lambda i, r: (i, 0)),
            pl.BlockSpec((128, 3 * KQP), lambda i, r: (0, 0)),
        ],
        out_specs=pl.BlockSpec((m_pad, 1), lambda i, r: (0, 0)),
    )
    y = pl.pallas_call(
        functools.partial(_kernel_mode, W=W, KQ=KQ, KQP=KQP, CH=CH, U=U,
                          mode=mode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(r0s, rows, colq, coll, vals, x3)
    return y[:m, 0]


# ---------------------------------------------------------------------------
# Mosaic lane-gather microbench: xg = take_along_axis(xrep, cols, axis=1)
# ---------------------------------------------------------------------------

def _gather_kernel(x_ref, c_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], c_ref[...], axis=1)


@functools.partial(jax.jit, static_argnames=("npad", "eb"))
def lane_gather(xrep, cols, npad, eb):
    """xrep (8, npad) f32, cols (8, E) i32 -> (8, E) f32 gathered."""
    E = cols.shape[1]
    grid = E // eb
    return pl.pallas_call(
        _gather_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((8, npad), lambda i: (0, 0)),
                  pl.BlockSpec((8, eb), lambda i: (0, i))],
        out_specs=pl.BlockSpec((8, eb), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((8, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(xrep, cols)


def run_gather_micro():
    print("-- Mosaic lane-gather take_along_axis(axis=1)", flush=True)
    E = 1 << 20
    key = jax.random.PRNGKey(0)
    for npad in (128, 1024, 10112):
        xrep = jnp.tile(
            jax.random.uniform(key, (1, npad), jnp.float32), (8, 1))
        cols = jax.random.randint(jax.random.PRNGKey(1), (8, E), 0, npad,
                                  INDEX)
        for eb in (512, 2048):
            try:
                def body(c, npad=npad, eb=eb, cols=cols):
                    g = lane_gather(c, cols, npad, eb)
                    return c + 0.0 * jnp.max(g)
                bench_scan(f"gather npad={npad} eb={eb}", body, xrep, nnz=E)
            except Exception as e:  # noqa: BLE001
                print(f"   gather npad={npad} eb={eb}: "
                      f"{type(e).__name__}: {str(e)[:300]}")


def main():
    print(f"device={jax.devices()[0]}", flush=True)
    run_gather_micro()

    for n, dens in [(10_000, 1e-3), (10_000, 1e-2)]:
        A = st.random(n, n, dens, format="csr", random_state=7)
        x = jax.random.uniform(jax.random.PRNGKey(3), (n,), jnp.float32)
        nnz = A.nnz
        print(f"-- n={n} density={dens} nnz={nnz}", flush=True)
        iph = np.asarray(A.indptr)
        plan = so.spmv_onehot_plan(iph, n, n)
        print(f"   plan: W={plan[1]} CH={plan[2]} U={plan[3]} "
              f"nchunks={len(plan[0])}")

        args = (A.indptr, A.indices, A.data, x, n, n, plan)
        for mode in ("full", "full_fat", "gather_only", "gather_fat",
                     "reduce_only"):
            try:
                def body(c, mode=mode):
                    y = spmv_mode(A.indptr, A.indices, A.data, c, n, n,
                                  plan, mode)
                    return c + 0.0 * y[:n]
                bench_scan(f"onehot[{mode}]", body, x, nnz=nnz)
            except Exception as e:  # noqa: BLE001
                print(f"   onehot[{mode}]: {type(e).__name__}: "
                      f"{str(e)[:200]}")

        # correctness of the instrumented modes
        y_ref = so.spmv_onehot(*args)
        for mode in ("full", "full_fat"):
            y_full = spmv_mode(*args, mode)
            err = float(jnp.max(jnp.abs(y_ref - y_full)))
            print(f"   {mode} max abs diff vs spmv_onehot: {err:.2e}")


if __name__ == "__main__":
    main()
