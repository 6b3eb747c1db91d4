#!/usr/bin/env bash
# CI gate: full test suite (8-device virtual CPU mesh); optionally the
# golden-image regression (CPU; ~10 min even downsampled+lowres — the
# reference_default config is heavy) and the quick TPU headline bench.
# Usage: scripts/ci.sh [--golden] [--tpu-bench]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== unit + parity + multichip tests (virtual CPU mesh) =="
python -m pytest tests/ -q

for arg in "$@"; do
  case "$arg" in
    --golden)
      echo "== golden-image regression (CPU, downsampled, lowres mesh) =="
      RUN_GOLDEN=1 GOLDEN_SCALE="${GOLDEN_SCALE:-20}" GOLDEN_FAST="${GOLDEN_FAST:-1}" \
        python -m pytest tests/test_golden.py -q
      ;;
    --tpu-bench)
      echo "== quick headline bench (real chip) =="
      BENCH_SMALL=1 python bench.py
      ;;
  esac
done

echo "CI OK"
