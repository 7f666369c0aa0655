#!/bin/bash
# Round-5 follow-up points, one lever at a time (sequential, fresh
# subprocess each):
#   A. batch-32 remat + mu=bf16   — does -1.27 GB of Adam state fit the
#                                   step that OOMed by 236 MB, and what
#                                   does it run at?
#   B. batch-24 + GN native stats — isolate FRIDO_GN_STATS_NATIVE at a
#                                   config with a measured baseline
#                                   (144.97 img/s).
#   C. batch-16 + GN native stats — same at the b16 baseline (128.29).
set -u
LOG=${1:-docs/r5_chip/train_followup_r5.log}
cd "$(dirname "$0")/.."
run() {
  echo "=== $* ===" | tee -a "$LOG"
  timeout 1800 env "$@" BENCH_BF16=1 BENCH_CHAIN=4 BENCH_REPEATS=3 \
    python scripts/bench_train.py 2>>"${LOG%.log}.err" | tee -a "$LOG"
  rc=${PIPESTATUS[0]}
  [ "$rc" -ne 0 ] && { echo "{\"error\": \"exit=$rc\"}" | tee -a "$LOG"; sleep 60; }
}
run BENCH_BATCH=32 BENCH_REMAT=1 BENCH_MU_DTYPE=bf16
run BENCH_BATCH=24 FRIDO_GN_STATS_NATIVE=1
run BENCH_BATCH=16 FRIDO_GN_STATS_NATIVE=1
