#!/usr/bin/env bash
# Round-3 follow-up queue (after tpu_r3_queue.sh): quiet re-measurements on
# an idle host — the first queue's headline sessions were contaminated by a
# concurrent CPU bench (single shared host core), and the utilization
# script's early-return bug was fixed after its first run.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$t" "$@" > "/tmp/r3_queue/$name.log" 2>&1
  echo "   rc=$? tail:"; tail -4 "/tmp/r3_queue/$name.log" | sed 's/^/   /'
}

# 1. utilization with the completion-fetch fix (the first run measured
#    dispatch latency, not device work)
run utilization_fixed 1800 python -u scripts/tpu_utilization.py

# 2. headline on a quiet host, warm cache (RT=512 programs cached by the
#    contaminated run)
BENCH_SESSIONS=2 run headline_quiet 2400 python bench.py

# 3. config ratios at a headline-representative resolution
CFGBENCH_RES=960x540 run config_ratios_960 2400 python -u scripts/tpu_config_bench.py

# 4. extreme full-res with the hq-mesh-tuned triangle block (the bench's
#    resolution-based default picks 64; the hq mesh measured best at 256)
#    and the r2-proven watchdog-safe TPP=4 (TPP=16 crashed the relay worker
#    on its first program in the r3 queue)
BENCH_CONFIG=extreme BENCH_WIDTH=1620 BENCH_HEIGHT=1350 BENCH_TPP=4 \
  BENCH_TRI_BLOCK=256 BENCH_SESSIONS=1 BENCH_REPEATS=1 \
  run extreme_fullres_b256 3000 python bench.py

echo "queue done ($(date +%H:%M:%S)); logs in /tmp/r3_queue/"
