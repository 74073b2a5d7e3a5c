#!/usr/bin/env python
"""Differential breakdown of the fused ALG1 pipeline: time fused variants
with stages removed to attribute cost (per-op timing lies under the dev
tunnel's ~1.75 ms dispatch floor)."""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
import importlib
sg = importlib.import_module('spmm_tpu.ops.spgemm')  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402

INDEX = jnp.int32


def bench(name, fn, args, K=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(K)]
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) * 1e3 / K
    print(f"  {name:<48s} {dt:9.4f} ms")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--density", type=float, default=0.1)
    args = p.parse_args()
    m = k = n = args.size
    A = st.random(m, k, args.density, format="csr", random_state=0)
    B = st.random(k, n, args.density, format="csr", random_state=1)
    cap = st.spgemm(A, B, alg=1).nnz
    g = m * n - cap
    print(f"device={jax.devices()[0]} n={m} d={args.density} cap={cap} g={g}")
    A6 = (A.indptr, A.indices, A.data, B.indptr, B.indices, B.data)

    @jax.jit
    def densify_only(aip, aix, adv, bip, bix, bdv):
        ad = sg._densify_marked(aip, aix, adv, m, k)
        bd = sg._densify_marked(bip, bix, bdv, k, n)
        return ad, bd

    bench("densify A+B (2 scatters)", densify_only, A6)

    for prec in ["DEFAULT", "HIGH", "HIGHEST"]:
        @jax.jit
        def value_only(aip, aix, adv, bip, bix, bdv, _p=prec):
            ad = sg._densify_marked(aip, aix, adv, m, k)
            bd = sg._densify_marked(bip, bix, bdv, k, n)
            tiny = jnp.asarray(sg._TINY, ad.dtype)
            c = jnp.dot(jnp.where(ad == tiny, 0, ad),
                        jnp.where(bd == tiny, 0, bd),
                        preferred_element_type=ad.dtype,
                        precision=getattr(lax.Precision, _p))
            return c

        bench(f"densify + value matmul {prec}", value_only, A6)

    @jax.jit
    def compute_full(aip, aix, adv, bip, bix, bdv):
        return sg._alg1_dense_compute(aip, aix, adv, bip, bix, bdv,
                                      jnp.float32(1.0), m, k, n)

    bench("full compute (value+pattern matmuls)", compute_full, A6)

    @jax.jit
    def fixed_full(aip, aix, adv, bip, bix, bdv):
        return sg._alg1_fixed(aip, aix, adv, bip, bix, bdv,
                              jnp.float32(1.0), m, k, n, cap)

    bench("full pipeline (compute+shift extract)", fixed_full, A6)

    # how expensive is the pattern matmul alone? compare c!=0 shortcut
    @jax.jit
    def compute_nopattern(aip, aix, adv, bip, bix, bdv):
        ad = sg._densify_marked(aip, aix, adv, m, k)
        bd = sg._densify_marked(bip, bix, bdv, k, n)
        tiny = jnp.asarray(sg._TINY, ad.dtype)
        c = jnp.dot(jnp.where(ad == tiny, 0, ad),
                    jnp.where(bd == tiny, 0, bd),
                    preferred_element_type=ad.dtype,
                    precision=lax.Precision.HIGHEST)
        return c, c != 0

    bench("compute w/o pattern matmul (c!=0 mask)", compute_nopattern, A6)


if __name__ == "__main__":
    main()
