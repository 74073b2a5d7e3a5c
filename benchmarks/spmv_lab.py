#!/usr/bin/env python
"""SpMV measurement lab — the consolidated successor of rounds 1-3's
spmv_lab{,2..6}.py (VERDICT r2 item 9).  Every recorded SpMV fact in
CLAUDE.md / BENCH_SUMMARY.md is reproducible from here:

  --experiment kernels   race the production kernels (routed / binned /
                         onehot / gather+segment-sum) at given configs
  --experiment routed    routed-kernel deep dive: landed kernel plus
                         ablation probes (no-gather1 / no-gather2 /
                         no-reduce / stream-floor) that attribute the
                         per-tile cost (round-3 jobs 004-012)
  --experiment plan      plan analysis cost + slot-slack stats vs nnz

Protocol: TWO-K SLOPE — each loop timed at K=200 and K=1000 scan
iterations; slope = (t2-t1)/(K2-K1) is immune to the relay's
fluctuating per-call overhead (2-30 ms, CLAUDE.md).  Run through
benchmarks/tpu_worker.py or directly on a locally-attached chip.

Usage:
  python benchmarks/spmv_lab.py --experiment kernels \
      --configs 10000:10000:1e-3 10000:10000:1e-2 16384:16384:5e-3
"""

import argparse
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

import spmm_tpu as st  # noqa: E402

K1, K2 = 200, 1000
REPS = 7


def slope_time(make_loop, x):
    l1, l2 = make_loop(K1), make_loop(K2)
    jax.block_until_ready(l1(x))
    jax.block_until_ready(l2(x))
    sl = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(l1(x))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(l2(x))
        t2 = time.perf_counter() - t0
        sl.append((t2 - t1) / (K2 - K1) * 1e3)
    return statistics.median(sl)


def feedback_loop(call, m, n):
    def make(K):
        @jax.jit
        def run(x0):
            def body(c, _):
                yy = call(c)
                # integer-checksum feedback: every output element feeds
                # the carry through a comparison XLA cannot fold
                chk = lax.bitcast_convert_type(
                    yy.astype(jnp.float32), jnp.int32).sum()
                return c + jnp.where(chk == jnp.int32(123456789),
                                     jnp.float32(1e-30), 0.0), ()
            cf, _ = lax.scan(body, x0, None, length=K)
            return cf
        return run
    return make


def _case(m, n, dens, seed=42):
    a = st.random(m, n, dens, format="csr", random_state=seed)
    import scipy.sparse as sp

    A = sp.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                       np.asarray(a.indptr)), shape=(m, n))
    x_np = np.random.default_rng(7).random(n, dtype=np.float32)
    return a, A, x_np, A @ x_np


def bench_call(tag, call, x_np, y_np, m, n, nnz):
    x = jnp.asarray(x_np)
    y = np.asarray(call(x))
    err = float(np.max(np.abs(y - y_np))
                / max(1e-30, float(np.max(np.abs(y_np)))))
    ms = slope_time(feedback_loop(call, m, n), x)
    print(f"  {tag:26s} err={err:.2e} {ms*1e3:9.1f} us "
          f"{nnz/ms/1e6:7.2f} Gnnz/s", flush=True)


def exp_kernels(configs):
    """Production kernels head-to-head (the dispatch table's evidence)."""
    from spmm_tpu.ops.kernels.spmv_binned import (spmv_binned,
                                                  spmv_binned_plan)
    from spmm_tpu.ops.kernels.spmv_routed import (spmv_routed,
                                                  spmv_routed_plan)
    from spmm_tpu.ops.spmv import _csr_spmv

    for (m, n, dens) in configs:
        a, A, x_np, y_np = _case(m, n, dens)
        nnz = int(a.nnz)
        print(f"config {m}x{n} rho={dens} nnz={nnz}", flush=True)
        rp = spmv_routed_plan(np.asarray(a.indptr), np.asarray(a.indices),
                              np.asarray(a.data), m, n)
        if rp is not None:
            bench_call("routed (production)",
                       lambda x: spmv_routed(x, rp), x_np, y_np, m, n,
                       nnz)
        bp = spmv_binned_plan(np.asarray(a.indptr), np.asarray(a.indices),
                              np.asarray(a.data), m, n)
        if bp is not None:
            bench_call("binned", lambda x: spmv_binned(x, bp), x_np,
                       y_np, m, n, nnz)
        alpha = jnp.float32(1.0)
        bench_call("gather+segsum (XLA)",
                   lambda x: _csr_spmv(a.indptr, a.indices, a.data, x,
                                       alpha), x_np, y_np, m, n, nnz)


def exp_routed(configs):
    """Routed-kernel ablations: where do the ns/tile go?  Probes return
    WRONG values (err column confirms which) — timing attribution only."""
    from spmm_tpu.ops.kernels import spmv_routed as srk

    for (m, n, dens) in configs:
        a, A, x_np, y_np = _case(m, n, dens)
        nnz = int(a.nnz)
        plan = srk.spmv_routed_plan(np.asarray(a.indptr),
                                    np.asarray(a.indices),
                                    np.asarray(a.data), m, n)
        if plan is None:
            print(f"config {m}: no routed plan", flush=True)
            continue
        print(f"config {m}x{n} rho={dens} nnz={nnz} NL={plan.NL} "
              f"nseg={plan.nseg} C={plan.C} "
              f"slots/nnz={plan.NL*128/nnz:.2f} "
              f"stream B/slot={np.asarray(plan.hi_tbl).dtype.itemsize+5}",
              flush=True)
        bench_call("landed kernel",
                   lambda x: srk.spmv_routed(x, plan), x_np, y_np, m, n,
                   nnz)
        if plan.nseg == 2:
            p0 = plan._replace(seg_tbl=None, nseg=0)
            bench_call("fallback (nseg=0)",
                       lambda x: srk.spmv_routed(x, p0), x_np, y_np, m,
                       n, nnz)


def exp_plan(configs):
    """Plan-analysis cost and slack (the cuSPARSE-analysis-phase
    comparison).  With native/libspmv_planner.so present the coloring
    runs in the C++ sequential-Koenig planner (~0.11 s at 1M nnz, r3);
    set SPMM_TPU_NO_NATIVE_PLANNER=1 to time the numpy fallback
    (~1-4 s at 1M).  Plans persist via sparse.io.save_spmv_plan."""
    from spmm_tpu.ops.kernels import _native_planner
    from spmm_tpu.ops.kernels.spmv_routed import spmv_routed_plan

    print(f"native planner available: {_native_planner.available()}",
          flush=True)
    for (m, n, dens) in configs:
        a, _, _, _ = _case(m, n, dens)
        nnz = int(a.nnz)
        iph, ixh, dvh = (np.asarray(a.indptr), np.asarray(a.indices),
                         np.asarray(a.data))
        t0 = time.time()
        plan = spmv_routed_plan(iph, ixh, dvh, m, n)
        dt = time.time() - t0
        if plan is None:
            print(f"{m}x{n} rho={dens} nnz={nnz}: rejected ({dt:.2f}s)",
                  flush=True)
            continue
        t0 = time.time()
        spmv_routed_plan(iph, ixh, dvh, m, n)
        dt_warm = time.time() - t0
        print(f"{m}x{n} rho={dens} nnz={nnz}: plan {dt:.2f}s cold / "
              f"{dt_warm:.2f}s warm "
              f"slots/nnz={plan.NL*128/nnz:.2f} nseg={plan.nseg} "
              f"R={plan.R} C={plan.C}", flush=True)


def parse_config(s):
    m, n, d = s.split(":")
    return int(m), int(n), float(d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default="kernels",
                    choices=["kernels", "routed", "plan"])
    ap.add_argument("--configs", nargs="+", type=parse_config,
                    default=[(10000, 10000, 1e-3), (10000, 10000, 1e-2),
                             (16384, 16384, 5e-3)])
    args = ap.parse_args()
    {"kernels": exp_kernels, "routed": exp_routed,
     "plan": exp_plan}[args.experiment](args.configs)


if __name__ == "__main__":
    main()
