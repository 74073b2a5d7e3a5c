#!/usr/bin/env bash
# Launch N local worker processes for the distributed comm test (the
# _launch_workers analogue).  A nonzero exit from any rank fails the run.
set -u
cd "$(dirname "$0")/../.."

NPROCS=${NPROCS:-2}
PORT=${PORT:-$((9000 + RANDOM % 2000))}
PIDS=()
FAIL=0

for rank in $(seq 0 $((NPROCS - 1))); do
    python experiments/distributed/comm_runner.py --nprocs "$NPROCS" \
        --rank "$rank" --coordinator "localhost:$PORT" &
    PIDS+=($!)
done

for pid in "${PIDS[@]}"; do
    wait "$pid" || FAIL=1
done

if [ "$FAIL" -eq 0 ]; then
    echo "MULTIPROCESS OK ($NPROCS ranks)"
else
    echo "MULTIPROCESS FAILED"
    exit 1
fi
