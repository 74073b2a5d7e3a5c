#!/usr/bin/env python
"""Multi-process distributed test runner — cluster semantics without a pod.

TPU re-build of /root/reference
tests/cupyx_tests/distributed_tests/comm_runner.py:21-60: N worker processes
on one host rendezvous through a coordinator (jax.distributed's coordination
service plays the rank-0 TCPStore role), build a global mesh over all
processes' devices, and run real collectives — no mocks.

Each worker: `python comm_runner.py --nprocs N --rank R [--coordinator ...]`;
the launcher script starts all ranks (ExceptionAwareProcess semantics via
exit codes).  On CPU each process contributes one device; on TPU pods this
is exactly the per-host bring-up.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nprocs", type=int, required=True)
    p.add_argument("--rank", type=int, required=True)
    p.add_argument("--coordinator", default="localhost:9911")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--density", type=float, default=0.2)
    args = p.parse_args()

    # one CPU device per process (pod-like layout)
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.nprocs,
                               process_id=args.rank)
    import jax.numpy as jnp
    import numpy as np

    import spmm_tpu as st
    from spmm_tpu import parallel as pp

    ndev = len(jax.devices())
    assert ndev >= args.nprocs, (ndev, args.nprocs)
    mesh = pp.make_mesh(args.nprocs)

    # every process generates the same seeded matrix (replicated input),
    # shards it over the global mesh, and checks the sharded results
    A = st.random(args.size, args.size, args.density, format="csr",
                  random_state=7)
    x = jnp.ones((args.size,), jnp.float32)
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    y = pp.spmv_sharded(Ash, x, mesh)
    xt = pp.spmv_t_sharded(Ash, y, mesh)

    As = A.to_scipy()
    want = As.T @ (As @ np.ones(args.size, np.float32))
    got = np.asarray(jax.device_get(xt))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    print(f"[rank {args.rank}/{args.nprocs}] OK "
          f"(global devices: {ndev})")
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
