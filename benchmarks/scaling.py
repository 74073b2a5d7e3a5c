#!/usr/bin/env python
"""Multi-device scaling benchmark: row-sharded SpMV / SpMM / SpGEMM-dense.

Reports per-device throughput and scaling efficiency vs the single-device
run (BASELINE.json target: ≥70% efficiency at 2+ hosts).  Runs on whatever
mesh is available: a real pod slice (one process per host via
`jax.distributed.initialize`), one host with N chips, or a virtual CPU mesh
(`XLA_FLAGS=--xla_force_host_platform_device_count=8` — correctness only,
timing meaningless).
"""

import argparse
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu import parallel as pp  # noqa: E402


def timed(fn, reps=10):
    jax.block_until_ready(fn())
    meds = []
    for _ in range(3):
        t0 = time.perf_counter()
        rs = [fn() for _ in range(reps)]
        jax.block_until_ready(rs)
        meds.append((time.perf_counter() - t0) * 1e3 / reps)
    return statistics.median(meds)


def run(n_devices, size, density, ncols):
    mesh = pp.make_mesh(n_devices)
    A = st.random(size, size, density, format="csr", random_state=0)
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    x = jnp.ones((size,), jnp.float32)
    B = jnp.ones((size, ncols), jnp.float32)
    t_spmv = timed(lambda: pp.spmv_sharded(Ash, x, mesh))
    t_spmm = timed(lambda: pp.spmm_sharded(Ash, B, mesh))
    t_spmv_t = timed(lambda: pp.spmv_t_sharded(
        Ash, pp.spmv_sharded(Ash, x, mesh), mesh))
    # x-streaming ring (O(n/D) x footprint; plan built once per structure)
    plan = pp.spmv_stream_plan(Ash, mesh)
    xs = pp.shard_vector(x, mesh)
    t_spmv_stream = timed(lambda: pp.spmv_sharded_streamed(plan, xs, mesh))
    return {"spmv": t_spmv, "spmm": t_spmm, "spmv_t(psum)": t_spmv_t,
            "spmv_stream": t_spmv_stream, "nnz": A.nnz}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=8192)
    p.add_argument("--density", type=float, default=0.01)
    p.add_argument("--ncols", type=int, default=256)
    p.add_argument("--devices", type=int, nargs="+", default=None)
    args = p.parse_args()
    total = len(jax.devices())
    counts = args.devices or sorted(
        {d for d in (1, 2, 4, 8, total) if d <= total})
    base = None
    print(f"devices available: {total}  ({jax.devices()[0].platform})")
    for nd in counts:
        r = run(nd, args.size, args.density, args.ncols)
        if base is None:
            base = r
        for op in ("spmv", "spmm", "spmv_t(psum)", "spmv_stream"):
            speedup = base[op] / r[op]
            eff = speedup / nd * 100
            print(f"D={nd} {op:<13s} {r[op]:9.3f} ms  "
                  f"speedup {speedup:5.2f}x  efficiency {eff:5.1f}%")
    print(f"nnz={base['nnz']}")


if __name__ == "__main__":
    main()
