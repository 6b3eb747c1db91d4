#!/usr/bin/env bash
# Round-3 queue D: confirm the new bench defaults (tile_rays=131072, G=8
# overlap -> measured 718 ms same-session) under the full driver protocol,
# then re-run the 960x540 config ratios with the watchdog-safe extreme row.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$t" "$@" > "/tmp/r3_queue/$name.log" 2>&1
  echo "   rc=$? tail:"; tail -3 "/tmp/r3_queue/$name.log" | sed 's/^/   /'
}

# 1. driver-protocol headline with the new defaults (2 fresh sessions)
BENCH_SESSIONS=2 run headline_t131k 2400 python bench.py

# 2. 960x540 same-session config ratios, extreme row chunked (CFGBENCH_TPP=4)
CFGBENCH_RES=960x540 run config_ratios_960_v2 3600 \
  python -u scripts/tpu_config_bench.py

echo "queue D done ($(date +%H:%M:%S)); logs in /tmp/r3_queue/"
