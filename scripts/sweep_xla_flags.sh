#!/bin/bash
# XLA scheduler/fusion flag sweep (VERDICT r5 task 2c) — the flag space
# has never been swept: every prior bench artifact records xla_flags="".
#
# Each point runs bench.py (sampling headline) or bench_train.py in a
# fresh subprocess with XLA_FLAGS / LIBTPU_INIT_ARGS set, sequentially
# (single chip). Points that change nothing are recorded anyway — a zero
# is a result (VERDICT: "record every delta (zeros included)").
#
# NOTE the axon tunnel compiles remotely; whether client-side XLA_FLAGS /
# LIBTPU_INIT_ARGS reach the remote compiler is itself a finding this
# sweep establishes (compare against the no-flag baseline: an identical
# number AND an identical compile-cache hit pattern means the flag never
# reached the compiler).
set -u
MODE=${1:-train}   # train | sample
OUT=${2:-docs/r5_chip/xla_flags_${MODE}.log}
cd "$(dirname "$0")/.."

# NOTE (round-5 finding, docs/PERF.md "XLA flag space"): the xla_tpu_*
# tuning flags below are CLIENT-UNREACHABLE under the axon tunnel — the
# client flag parser hard-rejects them at startup, so on this box every
# non-baseline point exits nonzero and gets an error record. The sweep
# is kept for environments with a local libtpu where the namespace
# parses; validate candidates first with a tiny matmul per flag.
declare -a NAMES=(
  baseline
  latency_hiding
  vmem_64m
  vmem_128m
)
declare -a FLAGS=(
  ""
  "--xla_tpu_enable_latency_hiding_scheduler=true"
  "--xla_tpu_scoped_vmem_limit_kib=65536"
  "--xla_tpu_scoped_vmem_limit_kib=131072"
)

for i in "${!NAMES[@]}"; do
  name=${NAMES[$i]}; flags=${FLAGS[$i]}
  echo "=== $name: XLA_FLAGS='$flags' ===" | tee -a "$OUT"
  if [ "$MODE" = train ]; then
    timeout 2400 env XLA_FLAGS="$flags" LIBTPU_INIT_ARGS="$flags" \
      BENCH_BATCH=16 BENCH_BF16=1 BENCH_CHAIN=4 BENCH_REPEATS=3 \
      python scripts/bench_train.py 2>>"${OUT%.log}.err" | tee -a "$OUT"
  else
    timeout 3000 env XLA_FLAGS="$flags" LIBTPU_INIT_ARGS="$flags" \
      python bench.py 2>>"${OUT%.log}.err" | tee -a "$OUT"
  fi
  rc=${PIPESTATUS[0]}  # python's status, not tee's
  [ "$rc" -ne 0 ] && { echo "{\"error\": \"exit=$rc\", \"point\": \"$name\"}" | tee -a "$OUT"; sleep 60; }
done
