#!/bin/bash
# Train-step batch/remat sweep at HEAD (VERDICT r5 task 1).
# Each point runs in a fresh subprocess under timeout so an OOM can't
# take the others down; points run SEQUENTIALLY (single chip).
# Usage: bash scripts/sweep_train.sh [logfile]
set -u
LOG=${1:-docs/r5_chip/train_sweep_r5.log}
cd "$(dirname "$0")/.."
run() {
  local batch=$1 remat=$2 chain=$3
  echo "=== batch=$batch remat=$remat bf16 chain=$chain ===" | tee -a "$LOG"
  timeout 1500 env BENCH_BATCH=$batch BENCH_REMAT=$remat BENCH_BF16=1 \
    BENCH_CHAIN=$chain BENCH_REPEATS=3 \
    python scripts/bench_train.py 2>>"${LOG%.log}.err" | tee -a "$LOG"
  # PIPESTATUS[0] is python's status — plain $? would read tee's (always
  # 0) and silently skip both the error record and the wedge drain
  local rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ]; then
    echo "{\"error\": \"exit=$rc (timeout/OOM)\", \"batch\": $batch, \"remat\": $remat}" | tee -a "$LOG"
    sleep 60  # let a potential tunnel wedge drain before the next point
  fi
}
run 16 0 4
run 24 0 4
run 32 0 4
run 32 1 4
run 48 1 4
run 64 1 4
