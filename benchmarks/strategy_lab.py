#!/usr/bin/env python
"""Consolidated ALG1 strategy lab (rounds 1-3's strategy_lab{,2,3}):
A/B probes for the hot SpGEMM building blocks on the current device.

  --experiment primitives    densify / matmul-precision / extract /
                             gather / sort strategy race
  --experiment fused         entire compute+extract as ONE XLA program:
                             extraction-strategy variants + dispatch floor
  --experiment differential  stage-removal breakdown of the production
                             `_alg1_fixed` pipeline

Protocol: batched dispatch (K eager calls, one sync) — adequate for the
RELATIVE comparisons these probes make; for recordable absolute numbers
use the two-K-slope + checksum-live in-scan protocol (bench.py,
CLAUDE.md): eager numbers here carry the dev tunnel's per-dispatch
latency, and a stage that times at ~0 may be an overlap artifact.
"""

import argparse
import importlib
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops import _primitives as prim  # noqa: E402

sg = importlib.import_module("spmm_tpu.ops.spgemm")

INDEX = jnp.int32


def bench(name, fn, args, K=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    rs = [fn(*args) for _ in range(K)]
    jax.block_until_ready(rs)
    dt = (time.perf_counter() - t0) * 1e3 / K
    print(f"  {name:<48s} {dt:9.4f} ms")
    return out


def _densify(indptr, indices, data, m, k, dtype=None):
    nnz = data.shape[0]
    rows = prim.rows_from_indptr(indptr, nnz)
    flat = rows * jnp.asarray(k, INDEX) + indices
    vals = data if dtype is None else jnp.ones_like(data, dtype)
    out = jnp.zeros((m * k,), vals.dtype)
    return out.at[flat].set(vals, indices_are_sorted=True,
                            unique_indices=True).reshape(m, k)


def _common(aip, aix, adv, bip, bix, bdv, m, k, n):
    ad = _densify(aip, aix, adv, m, k)
    bd = _densify(bip, bix, bdv, k, n)
    c = jnp.dot(ad, bd, preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST)
    ap = _densify(aip, aix, adv, m, k, jnp.bfloat16)
    bp = _densify(bip, bix, bdv, k, n, jnp.bfloat16)
    counts = jnp.dot(ap, bp, preferred_element_type=jnp.float32)
    return c, counts > 0


def exp_primitives(args):
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


def exp_fused(args):
    m = k = n = args.size
    A = st.random(m, k, args.density, format="csr", random_state=0)
    B = st.random(k, n, args.density, format="csr", random_state=1)
    C0 = st.spgemm(A, B, alg=2)
    cap = C0.nnz
    print(f"device={jax.devices()[0]} n={m} d={args.density} "
          f"nnzA={A.nnz} nnzC={cap}")

    print("[dispatch floor]")
    triv = jax.jit(lambda x: x + 1.0)
    X = jnp.zeros((m, n), jnp.float32)
    bench("x+1 on (n,n) f32", triv, (X,))
    triv8 = jax.jit(lambda x: x + 1.0)
    bench("x+1 on (8,128)", triv8, (jnp.zeros((8, 128)),))

    argsA = (A.indptr, A.indices, A.data, B.indptr, B.indices, B.data)

    print("[fused alg1 variants] (compute + extract, one program)")

    @jax.jit
    def compute_only(aip, aix, adv, bip, bix, bdv):
        return _common(aip, aix, adv, bip, bix, bdv, m, k, n)

    bench("compute only (no extract)", compute_only, argsA)

    @jax.jit
    def fused_sort(aip, aix, adv, bip, bix, bdv):
        c, mask = _common(aip, aix, adv, bip, bix, bdv, m, k, n)
        keys = jnp.where(mask.ravel(), jnp.int8(0), jnp.int8(1))
        idxs = jnp.arange(m * n, dtype=INDEX)
        _, flat_s, val_s = lax.sort((keys, idxs, c.ravel()), num_keys=1,
                                    is_stable=True)
        flat_c = flat_s[:cap]
        row = flat_c // n
        indptr = jnp.concatenate([
            jnp.zeros((1,), INDEX),
            jnp.cumsum(jnp.bincount(row, length=m), dtype=INDEX)])
        return indptr, flat_c % n, val_s[:cap]

    bench("extract: global stable sort", fused_sort, argsA)

    @jax.jit
    def fused_rowsort(aip, aix, adv, bip, bix, bdv):
        c, mask = _common(aip, aix, adv, bip, bix, bdv, m, k, n)
        keys = jnp.where(mask, jnp.int8(0), jnp.int8(1))
        cols = jnp.broadcast_to(
            jnp.arange(n, dtype=INDEX)[None, :], (m, n))
        _, col_s, val_s = lax.sort((keys, cols, c), num_keys=1,
                                   is_stable=True, dimension=-1)
        lens = jnp.sum(mask, axis=1, dtype=INDEX)
        indptr = jnp.concatenate([
            jnp.zeros((1,), INDEX), jnp.cumsum(lens, dtype=INDEX)])
        # gather compacted entries: output slot t lives in row r(t) at
        # offset t - indptr[r]; recover r via repeat-style searchsorted-free
        # trick: r = cumsative row id from indptr using bincount of starts.
        starts = indptr[:-1]
        seg = jnp.zeros((cap,), INDEX).at[starts].add(1) \
            .cumsum(dtype=INDEX) - 1
        off = jnp.arange(cap, dtype=INDEX) - indptr[seg]
        return indptr, col_s[seg, off], val_s[seg, off]

    bench("extract: per-row sort + 2D gather", fused_rowsort, argsA)

    @jax.jit
    def fused_nonzero(aip, aix, adv, bip, bix, bdv):
        c, mask = _common(aip, aix, adv, bip, bix, bdv, m, k, n)
        flat_c = jnp.nonzero(mask.ravel(), size=cap, fill_value=0)[0]
        row = (flat_c // n).astype(INDEX)
        indptr = jnp.concatenate([
            jnp.zeros((1,), INDEX),
            jnp.cumsum(jnp.bincount(row, length=m), dtype=INDEX)])
        return indptr, (flat_c % n).astype(INDEX), c.ravel()[flat_c]

    bench("extract: nonzero + gather", fused_nonzero, argsA)

    # correctness spot-check of winners vs alg2 reference
    ref_ip, ref_ix, ref_dv = (jnp.asarray(C0.indptr), jnp.asarray(C0.indices),
                              jnp.asarray(C0.data))
    for name, f in [("sort", fused_sort), ("rowsort", fused_rowsort),
                    ("nonzero", fused_nonzero)]:
        ip, ix, dv = f(*argsA)
        ok_ip = bool(jnp.array_equal(ip, ref_ip))
        ok_ix = bool(jnp.array_equal(ix, ref_ix))
        ok_dv = bool(jnp.allclose(dv, ref_dv, rtol=2e-5, atol=1e-6))
        print(f"  {name}: indptr={ok_ip} indices={ok_ix} values≈{ok_dv}")


def exp_differential(args):
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", default="primitives",
                   choices=["primitives", "fused", "differential"])
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--density", type=float, default=0.1)
    args = p.parse_args()
    {"primitives": exp_primitives, "fused": exp_fused,
     "differential": exp_differential}[args.experiment](args)


if __name__ == "__main__":
    main()
