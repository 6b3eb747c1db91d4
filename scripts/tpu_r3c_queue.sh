#!/usr/bin/env bash
# Round-3 queue C: re-measurements after the extreme-config parity fix
# (reference default AA-jitter features stay on => 17 unique rays/px, was 2)
# plus the tile-size x overlap-group sweep for the wall-vs-device gap.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "== $name ($(date +%H:%M:%S)) =="
  timeout "$t" "$@" > "/tmp/r3_queue/$name.log" 2>&1
  echo "   rc=$? tail:"; tail -5 "/tmp/r3_queue/$name.log" | sed 's/^/   /'
}

# 1. extreme full-res with the CORRECTED config (was 53.0 s at the
#    degenerate 2 rays/px; expect ~8.5x the ray work). TPP=4 watchdog-safe.
BENCH_CONFIG=extreme BENCH_WIDTH=1620 BENCH_HEIGHT=1350 BENCH_TPP=4 \
  BENCH_TRI_BLOCK=256 BENCH_SESSIONS=1 BENCH_REPEATS=1 \
  run extreme_fullres_fixed 3000 python bench.py

# 2. config ratios at 960x540 with the corrected extreme row
CFGBENCH_RES=960x540 run config_ratios_960_fixed 2400 \
  python -u scripts/tpu_config_bench.py

# 3. tile-size x overlap sweep at 1080p realistic (wall-vs-device gap):
#    65536 (32 tiles), 131072 (16), 262144 (8 = headline default)
OVERLAP_TILES=65536,131072,262144 OVERLAP_REPEATS=3 \
  run overlap_tilesweep 3600 python -u scripts/tpu_overlap_bench.py

echo "queue done ($(date +%H:%M:%S)); logs in /tmp/r3_queue/"
