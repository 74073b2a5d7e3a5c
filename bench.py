#!/usr/bin/env python
"""Headline benchmark: SpGEMM (CSR@CSR) n=1024, density=0.1, fp32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's fastest algorithm at this config — cuSPARSE ALG1
at 2.1494 ms (BASELINE.md, figures/alg_comparison.png table b, unstated GPU,
CUDA 13).  vs_baseline = baseline_ms / our_ms (>1 ⇒ faster than reference).
"""

import json
import statistics
import sys
import time

import jax

sys.path.insert(0, ".")

import spmm_tpu as st  # noqa: E402

BASELINE_MS = 2.1494  # reference ALG1, n=1024, rho=0.1 (BASELINE.md)
SIZE = 1024
DENSITY = 0.1
RUNS = 30
WARMUP = 5


def main():
    A = st.random(SIZE, SIZE, DENSITY, format="csr", random_state=2008)
    B = st.random(SIZE, SIZE, DENSITY, format="csr", random_state=2009)

    def op():
        return st.spgemm(A, B, alg=1)

    for _ in range(WARMUP):
        jax.block_until_ready(op().data)
    times = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        jax.block_until_ready(op().data)
        times.append((time.perf_counter() - t0) * 1e3)
    med = statistics.median(times)
    print(json.dumps({
        "metric": "spgemm_csr_n1024_d0.1_median_ms",
        "value": round(med, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / med, 3),
    }))


if __name__ == "__main__":
    main()
