#!/usr/bin/env python
"""A/B lab for the hot alg1 building blocks on the current device.

Everything is timed with batched dispatch (K calls, one sync) because the
dev tunnel charges ~24 ms per host sync; real deployments sync rarely.
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402

INDEX = jnp.int32


def bench(name, fn, args, K=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(K)]
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) * 1e3 / K
    print(f"  {name:<44s} {dt:9.4f} ms")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--density", type=float, default=0.1)
    args = p.parse_args()
    m = k = n = args.size
    A = st.random(m, k, args.density, format="csr", random_state=0)
    nnz = A.nnz
    rows = A.rows
    flat = (rows.astype(INDEX) * k + A.indices).astype(INDEX)
    vals = A.data
    print(f"device={jax.devices()[0]} n={m} d={args.density} nnz={nnz}")

    print("[densify strategies]")

    @jax.jit
    def dens_scatter(flat, vals):
        out = jnp.zeros((m * k,), vals.dtype)
        return out.at[flat].set(vals, indices_are_sorted=True,
                                unique_indices=True).reshape(m, k)

    bench("scatter .at[].set sorted+unique", dens_scatter, (flat, vals))

    @jax.jit
    def dens_scatter_add(flat, vals):
        out = jnp.zeros((m * k,), vals.dtype)
        return out.at[flat].add(vals, indices_are_sorted=True,
                                unique_indices=True).reshape(m, k)

    bench("scatter .at[].add sorted+unique", dens_scatter_add, (flat, vals))

    @jax.jit
    def dens_segment(flat, vals):
        return jax.ops.segment_sum(vals, flat, num_segments=m * k,
                                   indices_are_sorted=True).reshape(m, k)

    bench("segment_sum", dens_segment, (flat, vals))

    @jax.jit
    def dens_searchsorted(flat, vals):
        targets = jnp.arange(m * k, dtype=INDEX)
        pos = jnp.searchsorted(flat, targets, side="left")
        pos = jnp.minimum(pos, nnz - 1)
        hit = flat[pos] == targets
        return jnp.where(hit, vals[pos], 0).reshape(m, k)

    bench("searchsorted + sorted gather", dens_searchsorted, (flat, vals))

    print("[value matmul precisions]")
    Ad = dens_scatter(flat, vals)
    Bd = jnp.asarray(
        st.random(k, n, args.density, format="csr", random_state=1)
        .toarray())
    jax.block_until_ready((Ad, Bd))
    for prec in ["DEFAULT", "HIGH", "HIGHEST"]:
        f = jax.jit(lambda a, b, p=prec: jnp.dot(
            a, b, preferred_element_type=jnp.float32,
            precision=getattr(jax.lax.Precision, p)))
        bench(f"f32 matmul precision={prec}", f, (Ad, Bd))

    fb = jax.jit(lambda a, b: jnp.dot(
        a.astype(jnp.bfloat16), (b != 0).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))
    bench("pattern matmul bf16 DEFAULT", fb, (Ad, Bd))

    print("[extract strategies]  (dense+mask → compact indices/data)")
    mask = Ad != 0

    @jax.jit
    def ext_nonzero(c, mk_):
        flat_ = jnp.nonzero(mk_.ravel(), size=nnz, fill_value=0)[0]
        return flat_, c.ravel()[flat_]

    bench("jnp.nonzero(size) + gather", ext_nonzero, (Ad, mask))

    @jax.jit
    def ext_cumsum(c, mk_):
        mr = mk_.ravel()
        pos = jnp.cumsum(mr.astype(INDEX)) - 1
        tgt = jnp.arange(nnz, dtype=INDEX)
        # position of t-th nonzero: searchsorted over monotone cumsum
        flat_ = jnp.searchsorted(pos, tgt, side="left")
        return flat_, c.ravel()[flat_]

    bench("cumsum + searchsorted + gather", ext_cumsum, (Ad, mask))

    @jax.jit
    def ext_sort(c, mk_):
        mr = mk_.ravel()
        keys = jnp.where(mr, 0, 1).astype(jnp.int8)
        idx = jnp.arange(m * k, dtype=INDEX)
        _, flat_sorted, vals_sorted = jax.lax.sort(
            (keys, idx, c.ravel()), num_keys=1, is_stable=True)
        return flat_sorted[:nnz], vals_sorted[:nnz]

    bench("stable sort compaction", ext_sort, (Ad, mask))

    print("[gather cost reference]")
    g = jax.jit(lambda c, f: c.ravel()[f])
    bench("gather nnz sorted indices", g, (Ad, flat))
    perm = jax.random.permutation(jax.random.PRNGKey(0), flat)
    bench("gather nnz random indices", g, (Ad, perm))

    print("[sort cost reference]")
    s = jax.jit(lambda x: jax.lax.sort((x, x), num_keys=1, is_stable=True))
    bench("sort nnz int32 pairs", s, (flat,))
    big = jax.random.randint(jax.random.PRNGKey(1), (10_700_000,), 0,
                             2**30, dtype=jnp.int32)
    s2 = jax.jit(lambda x: jax.lax.sort(
        (x, x.astype(jnp.float32)), num_keys=1, is_stable=True))
    bench("sort 10.7M int32+f32 (alg2-scale)", s2, (big,), K=5)


if __name__ == "__main__":
    main()
