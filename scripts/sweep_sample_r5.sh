#!/bin/bash
# Round-5 sampling levers (VERDICT r5 task 2): the untried knobs round 4
# named. Sequential (single chip), fresh subprocess per point, JSON
# artifacts into docs/r5_chip/.
set -u
cd "$(dirname "$0")/.."
OUT=docs/r5_chip
run() {
  local name=$1; shift
  echo "=== $name: $* ==="
  timeout 3600 env "$@" BENCH_REPEATS=2 python bench.py \
    > "$OUT/bench_$name.json" 2>>"$OUT/bench_$name.err"
  local rc=$?
  cat "$OUT/bench_$name.json"
  [ $rc -ne 0 ] && { echo "(exit=$rc)"; sleep 60; }
}
# (a) the OOM-cliff probe: batch 136/144 at decode_chunk 16
run b136_dc16 BENCH_BATCH=136 BENCH_DECODE_CHUNK=16
run b144_dc16 BENCH_BATCH=144 BENCH_DECODE_CHUNK=16
# (b) cfg_mode=batched re-measure post-GN-fix (b128 fits since r3)
run b128_cfgbatched BENCH_BATCH=128 BENCH_CFG_MODE=batched
