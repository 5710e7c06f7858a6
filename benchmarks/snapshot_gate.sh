#!/bin/bash
# Snapshot gate (CLAUDE.md): probe the tunnel, run the on-chip test lane
# and the official bench at the current commit, and append the record to
# BENCH_NOTES.md. Run from the repo root:
#
#   bash benchmarks/snapshot_gate.sh
#
# Exits non-zero (without appending) if the probe, the lane or the bench
# fails — the tree must not be snapshotted on a red gate.
set -u
cd "$(dirname "$0")/.."

# resolve a python with jax (the login shell's PATH may not carry the venv)
PY="${PYTHON:-python}"
"$PY" -c "import jax" 2>/dev/null || PY=/opt/venv/bin/python

echo "== probe =="
timeout 90 "$PY" -c "import jax.numpy as j; print(int(j.arange(8).sum()))" \
  || { echo "tunnel probe failed/wedged"; exit 1; }

echo "== TPU lane =="
VCT_TPU_TESTS=1 timeout 590 "$PY" -m pytest -m tpu -q || exit 1

echo "== bench =="
line=$(timeout 590 "$PY" bench.py) || exit 1
echo "$line"
case "$line" in
  *'"platform": "tpu"'*) ;;
  *) echo "bench ran on a fallback platform — gate NOT satisfied"; exit 1 ;;
esac

sha=$(git rev-parse --short HEAD)
{
  echo
  echo "### Gate run at ${sha} ($(date -u +%Y-%m-%dT%H:%MZ))"
  echo
  echo '```json'
  echo "$line"
  echo '```'
} >> BENCH_NOTES.md
echo "recorded in BENCH_NOTES.md at ${sha}"
