#!/bin/bash
# Soak the full test suite N times consecutively, recording pass/fail per
# run — the determinism evidence VERDICT round 4 asked for ("done = 10/10
# consecutive full-suite green runs, recorded in a commit message or notes
# file"). Usage: scripts/suite_soak.sh [N] [logfile]
set -u
N="${1:-10}"
LOG="${2:-/tmp/suite_soak.log}"
cd "$(dirname "$0")/.."
: > "$LOG"
for i in $(seq 1 "$N"); do
  start=$(date +%s)
  full=$(python -m pytest tests/ -q 2>&1)
  rc=$?
  end=$(date +%s)
  out=$(echo "$full" | tail -2)
  echo "run $i: rc=$rc elapsed=$((end-start))s :: $(echo "$out" | tr '\n' ' ')" >> "$LOG"
  if [ "$rc" -ne 0 ]; then
    echo "$full" > "${LOG%.log}_run${i}_fail.txt"
  fi
done
echo DONE >> "$LOG"
