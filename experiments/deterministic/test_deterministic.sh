#!/usr/bin/env bash
# Run-to-run bitwise determinism suite.
#
# TPU re-build of /root/reference deterministic/test_deterministic.sh:4-35:
# for each algorithm and each seed, run the generator TWICE in separate OS
# processes (fresh runtime each time) and diff the full CSR text dumps for
# bitwise equality.
set -u
cd "$(dirname "$0")/../.."

# Default to CPU: these are correctness suites; the ambient env may point
# JAX at a remote TPU whose per-process startup dwarfs the run.  Set
# SPMM_PLATFORM=tpu to exercise the TPU backend instead.
if [ "${SPMM_PLATFORM:-cpu}" = "cpu" ]; then
    export JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu
fi

SEEDS=${SEEDS:-"1 2 3 4 5 6 7 8 9 10"}
SIZES=${SIZES:-"32 64 128 256"}
DENSITIES=${DENSITIES:-"0.01 0.1 0.3 0.5"}
ALGS=${ALGS:-"1 2 3"}
OUTDIR=$(mktemp -d)
FAIL=0

run_test() {
    local alg=$1 seed=$2
    local f1="$OUTDIR/alg${alg}_seed${seed}_run1.txt"
    local f2="$OUTDIR/alg${alg}_seed${seed}_run2.txt"
    python experiments/deterministic/run_alg.py --alg "$alg" --seed "$seed" \
        --sizes $SIZES --densities $DENSITIES --out "$f1" >/dev/null || return 1
    python experiments/deterministic/run_alg.py --alg "$alg" --seed "$seed" \
        --sizes $SIZES --densities $DENSITIES --out "$f2" >/dev/null || return 1
    if diff -q "$f1" "$f2" >/dev/null; then
        echo "alg$alg seed=$seed: deterministic"
    else
        echo "alg$alg seed=$seed: NOT deterministic"
        return 1
    fi
}

for alg in $ALGS; do
    for seed in $SEEDS; do
        run_test "$alg" "$seed" || FAIL=1
    done
done

rm -rf "$OUTDIR"
if [ "$FAIL" -eq 0 ]; then
    echo "ALL DETERMINISTIC"
else
    echo "DETERMINISM FAILURES DETECTED"
    exit 1
fi
