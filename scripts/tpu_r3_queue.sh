#!/usr/bin/env bash
# Round-3 TPU experiment queue: run everything pending against the relay in
# one go (single process at a time — the chip is shared), logging to
# /tmp/r3_queue/. Safe to re-run; the persistent compile cache amortizes.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$t" "$@" > "/tmp/r3_queue/$name.log" 2>&1
  echo "   rc=$? tail:"; tail -4 "/tmp/r3_queue/$name.log" | sed 's/^/   /'
}

# 1. knob re-sweep after the gate/flip kernels (same-session comparisons)
run sweep_r3 1800 python -u scripts/tpu_sweep_r3.py

# 2. utilization account (empirical FMA peak + achieved kernel rate)
run utilization 1200 python -u scripts/tpu_utilization.py

# 3. all five BASELINE configs in ONE session, ratios vs realistic
run config_ratios 1800 python -u scripts/tpu_config_bench.py

# 4. overlap-group sweep at 1080p (wall-vs-device gap)
run overlap 1800 python -u scripts/tpu_overlap_bench.py

# 5. headline bench, 2 sessions (fresh-session compile_s telemetry)
BENCH_SESSIONS=2 run headline 2400 python bench.py

# 6. extreme at FULL resolution (watchdog-safe chunking)
BENCH_CONFIG=extreme BENCH_WIDTH=1620 BENCH_HEIGHT=1350 BENCH_TPP=16 \
  BENCH_SESSIONS=1 BENCH_REPEATS=1 run extreme_fullres 3000 python bench.py

echo "queue done ($(date +%H:%M:%S)); logs in /tmp/r3_queue/"
