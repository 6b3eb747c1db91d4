#!/usr/bin/env bash
# Relay-recovery waiter: ping the TPU relay with a trivial op every ~2 min;
# when it answers, fire the queued measurement script (arg 1, default
# tpu_r3f_queue.sh). Bounded by MAX_WAIT_S (default 6 h). Never kills
# processes by pattern; runs detached via nohup by the caller.
set -uo pipefail
cd "$(dirname "$0")/.."
QUEUE="${1:-scripts/tpu_r3f_queue.sh}"
MAX_WAIT_S="${MAX_WAIT_S:-21600}"
start=$(date +%s)
while :; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((8,128))*2).sum()) == 2048.0
" >/dev/null 2>&1; then
    echo "relay up at $(date -u +%H:%M:%S); firing $QUEUE"
    bash "$QUEUE"
    exit 0
  fi
  now=$(date +%s)
  if (( now - start > MAX_WAIT_S )); then
    echo "relay still down after ${MAX_WAIT_S}s; giving up"
    exit 1
  fi
  echo "relay down at $(date -u +%H:%M:%S); retry in 120s"
  sleep 120
done
