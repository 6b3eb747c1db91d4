#!/usr/bin/env bash
# CI gate: full test suite (8-device virtual CPU mesh), the golden-image
# regression (downsampled, CPU), and — when a TPU is attached — the quick
# headline bench. Usage: scripts/ci.sh [--tpu-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit + parity + multichip tests (virtual CPU mesh) =="
python -m pytest tests/ -q

echo "== golden-image regression (CPU, downsampled) =="
RUN_GOLDEN=1 GOLDEN_SCALE="${GOLDEN_SCALE:-20}" python -m pytest tests/test_golden.py -q

if [[ "${1:-}" == "--tpu-bench" ]]; then
  echo "== quick headline bench (real chip) =="
  BENCH_SMALL=1 python bench.py
fi

echo "CI OK"
