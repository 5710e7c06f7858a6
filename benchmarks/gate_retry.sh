#!/bin/bash
# Retry the snapshot gate until it passes (relay wedges 30-60 min).
# Usage: bash benchmarks/gate_retry.sh [max_attempts]
cd "$(dirname "$0")/.."
max=${1:-40}
for i in $(seq 1 "$max"); do
  echo "== gate attempt $i/$max ($(date -u +%H:%M:%SZ)) =="
  if bash benchmarks/snapshot_gate.sh; then
    echo "GATE PASSED on attempt $i"
    exit 0
  fi
  sleep 240
done
echo "GATE NEVER PASSED"
exit 1
