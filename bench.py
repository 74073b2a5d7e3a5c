#!/usr/bin/env python
"""Headline benchmark: SpGEMM (CSR@CSR) n=1024, density=0.1, fp32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's fastest algorithm at this config — cuSPARSE ALG1
at 2.1494 ms (BASELINE.md, figures/alg_comparison.png table b, unstated GPU,
CUDA 13).  vs_baseline = baseline_ms / our_ms (>1 ⇒ faster than reference).

Measurement: the serving-path pipeline (`spgemm_fixed`: one fused XLA
program per call, output capacity sized once up front — the same reuse
pattern cuSPARSE callers employ with pre-allocated buffers), timed as K
dispatches per sync to amortise the dev-tunnel's per-sync latency; median
over batches.
"""

import json
import statistics
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402
from spmm_tpu.ops.spgemm import _alg1_fixed  # noqa: E402

BASELINE_MS = 2.1494  # reference ALG1, n=1024, rho=0.1 (BASELINE.md)
SIZE = 1024
DENSITY = 0.1
BATCH = 10
BATCHES = 10


def main():
    m = k = n = SIZE
    A = st.random(m, k, DENSITY, format="csr", random_state=2008)
    B = st.random(k, n, DENSITY, format="csr", random_state=2009)

    # sizing pass (the spMatGetSize readback, once)
    C = st.spgemm(A, B, alg=1)
    cap = C.nnz
    alpha = jnp.float32(1.0)
    args = (A.indptr, A.indices, A.data, B.indptr, B.indices, B.data,
            alpha, m, k, n, cap)

    def op():
        return _alg1_fixed(*args)

    # warmup (compile)
    jax.block_until_ready(op())
    medians = []
    for _ in range(BATCHES):
        t0 = time.perf_counter()
        rs = [op() for _ in range(BATCH)]
        jax.block_until_ready(rs)
        medians.append((time.perf_counter() - t0) * 1e3 / BATCH)
    med = statistics.median(medians)
    print(json.dumps({
        "metric": "spgemm_csr_n1024_d0.1_median_ms",
        "value": round(med, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / med, 3),
    }))


if __name__ == "__main__":
    main()
