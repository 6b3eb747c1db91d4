#!/usr/bin/env bash
# Round-3 continuation queue F (fired by the recovery waiter):
#   1. stage-mode A/B (pool staging scatter vs gather vs unique) — the
#      profile shows the prologue staging scatter + contribution
#      scatter-add are ~15% of device time (PERF.md)
#   2. shadow-pack block-order A/B on the extreme light kernel
#   3. extreme full-res re-measure with every continuation win
#      (async fetch, device ray gen, LANE_GATE; last published 335.2 s)
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

timeout 2400 python -u scripts/tpu_stage_ab.py \
  > /tmp/r3_queue/stage_ab.log 2>&1
echo "stage_ab rc=$?"; tail -8 /tmp/r3_queue/stage_ab.log

PROF=1 AB_ROUNDS=3 timeout 2400 python -u scripts/tpu_shadoworder_ab.py \
  > /tmp/r3_queue/shadoworder_ab.log 2>&1
echo "shadoworder rc=$?"; tail -8 /tmp/r3_queue/shadoworder_ab.log

BENCH_CONFIG=extreme BENCH_WIDTH=1620 BENCH_HEIGHT=1350 \
BENCH_SESSIONS=1 BENCH_REPEATS=2 \
  timeout 3300 python -u bench.py \
  > /tmp/r3_queue/extreme_fullres.log 2>&1
echo "extreme rc=$?"; tail -6 /tmp/r3_queue/extreme_fullres.log
