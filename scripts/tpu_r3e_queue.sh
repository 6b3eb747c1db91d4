#!/usr/bin/env bash
# Round-3 queue E: knob re-sweep around the new bench defaults
# (B=64, ratio=64, chunk=128, RT=512) on one 131k-ray 1080p tile,
# all in ONE relay session via tpu_sweep_r3.py.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3_queue

SWEEP="64,64,128,512;64,64,128,1024;128,64,128,512;64,32,128,512;64,128,128,512;64,64,256,512;64,64,64,512" \
  timeout 3000 python -u scripts/tpu_sweep_r3.py \
  > /tmp/r3_queue/sweep_r3e.log 2>&1
echo "rc=$?"; tail -12 /tmp/r3_queue/sweep_r3e.log

# hq-mesh north-star row with the round-3 kernels (r2: 3,663 ms best)
timeout 2400 python -u scripts/bench_hqmesh.py \
  > /tmp/r3_queue/hqmesh_r3.log 2>&1
echo "hqmesh rc=$?"; tail -6 /tmp/r3_queue/hqmesh_r3.log
