#!/usr/bin/env bash
# Benchmark sweep orchestrator — the analogue of the reference's per-
# directory run.sh scripts (e.g. SpGEMM_alg_comparison/run.sh:12-22), with
# stdout tee'd to a results file the same way.
set -u
cd "$(dirname "$0")/.."

RUNS=${RUNS:-100}
SIZES=${SIZES:-"512 1024"}
DENSITIES=${DENSITIES:-"0.1 0.5"}
OUT=${OUT:-benchmark_results.txt}

{
  echo "# spmm_tpu benchmark sweep $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  python -c "import jax; print('# devices:', jax.devices())"
  echo "## alg comparison"
  python benchmarks/alg_comparison.py --size $SIZES --density $DENSITIES \
      --runs "$RUNS" --json
  echo "## dense vs sparse"
  python benchmarks/dense_vs_sparse.py --runs "$RUNS" --json
  echo "## spgemm vs spmv"
  python benchmarks/spgemm_vs_spmv.py --runs 20 --json
} 2>&1 | tee "$OUT"
