#!/usr/bin/env bash
# Cross-implementation bitwise check: framework ESC SpGEMM vs the native C++
# program, 3-phase with a PASS/FAIL report file.
#
# TPU re-build of /root/reference cupy_cusparse/run_all_alg3.sh:27-77:
#   [1/3] python generates A, B and the framework result C_py (text dumps)
#   [2/3] the native binary recomputes C_cpp from the same text inputs
#   [3/3] bitwise compare → report
set -u
cd "$(dirname "$0")/../.."

# Default to CPU: these are correctness suites; the ambient env may point
# JAX at a remote TPU whose per-process startup dwarfs the run.  Set
# SPMM_PLATFORM=tpu to exercise the TPU backend instead.
if [ "${SPMM_PLATFORM:-cpu}" = "cpu" ]; then
    export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
fi

SIZES=${SIZES:-"32 64 128 256 512"}
DENSITIES=${DENSITIES:-"0.01 0.1 0.5"}
ALGS=${ALGS:-"1 2 3"}
SEED=${SEED:-123}
WORKDIR=$(mktemp -d)
REPORT=${REPORT:-cross_check_report.txt}
CUEXE=${CUEXE:-native/spgemm_cross_check}

[ -x "$CUEXE" ] || bash native/build.sh

: > "$REPORT"
FAIL=0
for alg in $ALGS; do
  for size in $SIZES; do
    for density in $DENSITIES; do
      prefix="$WORKDIR/cc_${alg}_${size}_${density}"
      echo "[1/3] generate size=$size density=$density alg=$alg"
      python experiments/cross_check/gen_and_save.py --size "$size" \
          --density "$density" --seed "$SEED" --alg "$alg" \
          --prefix "$prefix" || { FAIL=1; continue; }
      echo "[2/3] native recompute"
      if [ "$alg" = "1" ]; then
        "$CUEXE" "${prefix}_A" "${prefix}_B" "${prefix}_C_cpp" --alg1 \
            || { FAIL=1; continue; }
        CMP_ARGS="--values-rtol 1e-5"
      else
        "$CUEXE" "${prefix}_A" "${prefix}_B" "${prefix}_C_cpp" \
            || { FAIL=1; continue; }
        CMP_ARGS=""
      fi
      echo "[3/3] compare"
      if python experiments/cross_check/compare_csrs_txt.py \
          "${prefix}_C_py" "${prefix}_C_cpp" $CMP_ARGS; then
        echo "PASS alg=$alg size=$size density=$density" >> "$REPORT"
      else
        echo "FAIL alg=$alg size=$size density=$density" >> "$REPORT"
        FAIL=1
      fi
    done
  done
done

rm -rf "$WORKDIR"
echo "=== report ($REPORT) ==="
cat "$REPORT"
exit $FAIL
