#!/usr/bin/env python
"""spmm_tpu quickstart: containers, the three SpGEMM strategies, dispatch,
and multi-device row sharding — runnable on CPU (set
JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8) or any TPU."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

import spmm_tpu as st
from spmm_tpu import parallel as pp
from spmm_tpu.utils import memory_model, profiler

# --- containers -----------------------------------------------------------
A = st.random(1024, 1024, density=0.1, format="csr", random_state=0)
B = st.random(1024, 1024, density=0.1, format="csr", random_state=1)
print(f"A: {A!r}")
print(f"  canonical={A.has_canonical_format}  density={A.density:.3f}")

# --- the three SpGEMM strategies -----------------------------------------
for alg, label in [(1, "dense-intermediate (MXU)"),
                   (2, "ESC two-phase"),
                   (3, "chunked ESC (cf=0.25)")]:
    C = st.spgemm(A, B, alg=alg, chunk_fraction=0.25)
    est = memory_model.spgemm_peak_estimate(A, B, alg)
    print(f"alg{alg} {label}: nnz(C)={C.nnz}  est peak ≈ "
          f"{est['peak_mb']:.0f} MB")

# determinism: alg2 and alg3 agree bitwise, at every chunk fraction
c2 = np.asarray(st.spgemm(A, B, alg=2).data).view(np.uint32)
c3 = np.asarray(st.spgemm(A, B, alg=3, chunk_fraction=0.1).data).view(
    np.uint32)
print("alg2 == alg3 bitwise:", bool(np.array_equal(c2, c3)))

# --- operator dispatch ----------------------------------------------------
y = A @ jnp.ones(1024)                      # SpMV
Z = A @ jnp.ones((1024, 256))               # SpMM (density-aware routing)
D = A @ B                                   # SpGEMM via @
print("dispatch:", y.shape, Z.shape, D.nnz)

# --- serving path (single fused program, fixed capacity) ------------------
C_fixed, nnz = st.spgemm_fixed(A, B)
print("spgemm_fixed:", int(nnz), "nnz in one dispatch")

# --- row-sharded execution over the device mesh ---------------------------
ndev = len(jax.devices())
if ndev > 1:
    mesh = pp.make_mesh(min(ndev, 8))
    Ash = pp.shard_csr(A, mesh, balance="nnz")
    ysh = pp.spmv_sharded(Ash, jnp.ones(1024), mesh)
    yg = pp.unshard_rows(ysh, 1024, Ash.row_bounds)
    print("sharded SpMV matches:",
          bool(np.allclose(np.asarray(yg), np.asarray(y), rtol=1e-5)))
else:
    print("(single device: skipping mesh demo)")

# --- benchmark harness ----------------------------------------------------
r = profiler.benchmark(lambda: (A @ jnp.ones(1024)), n_repeat=5, n_warmup=2)
print(f"spmv median: {r.median_ms:.3f} ms")
