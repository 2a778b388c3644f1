#!/bin/bash
# Watch for a quiet box window, then regenerate the scaling-gate artifact.
#
# The 2->8 scaling gate (scripts/bench_scaling.py) needs ~25 min of quiet
# box: three round-5 regeneration attempts collapsed mid-run under
# hypervisor-neighbor load (BENCH/gate_attempts_r5.md). A SOLO kernel
# probe cannot detect that state — one worker lands on a free core and
# reads ~265 imgs/s while a neighbor still holds 4-5 physical cores (the
# 14:10Z launch did exactly that and its in-run 8-worker ceiling was
# bimodal 188-240 vs the quiet 274-283). So the watcher probes the
# 8-WORKER ceiling: launch only when the median repeat shows
# agg >= QUIET_AGG8 AND every per-worker rate >= QUIET_WORKER_MIN
# (quiet baseline: agg 2225, flat 274.7-283.4; noisy windows: agg
# 1711-2163 with a 178-199 tail).
#
# Usage: bash scripts/gate_watch.sh [deadline_minutes]
set -u
cd "$(dirname "$0")/.."
DEADLINE_MIN="${1:-150}"
QUIET_AGG8="${SPARK_GRAFT_QUIET_AGG8:-2050}"
QUIET_WORKER_MIN="${SPARK_GRAFT_QUIET_WORKER_MIN:-255}"
PROBE_SLEEP="${SPARK_GRAFT_PROBE_SLEEP:-180}"
LOG=/tmp/gate_watch_r5.log
START=$(date +%s)
echo "gate_watch start $(date -u +%FT%TZ), deadline ${DEADLINE_MIN}min, threshold agg8>=${QUIET_AGG8} worker_min>=${QUIET_WORKER_MIN}" | tee -a "$LOG"

BUSY_LOCK="${SPARK_GRAFT_BUSY_LOCK:-/tmp/spark_graft_busy}"

while true; do
  NOW=$(date +%s)
  ELAPSED_MIN=$(( (NOW - START) / 60 ))
  if [ "$ELAPSED_MIN" -ge "$DEADLINE_MIN" ]; then
    echo "DEADLINE reached after ${ELAPSED_MIN}min without a quiet window; committed PASS artifact stands" | tee -a "$LOG"
    exit 2
  fi
  # Foreground session coordination: while the builder runs its own
  # Spark/pytest work it touches this lockfile; probing (or launching
  # the gate) during that work would read self-inflicted load.
  if [ -e "$BUSY_LOCK" ]; then
    echo "$(date -u +%FT%TZ) busy lock present, skipping probe" >> "$LOG"
    sleep "$PROBE_SLEEP"
    continue
  fi
  PROBE=$(SPARK_GRAFT_CEILING_LEVELS=8 SPARK_GRAFT_CEILING_REPEATS=3 \
          SPARK_GRAFT_CEILING_IMAGES=600 \
          python scripts/bench_ceiling.py 2>/dev/null | tail -1)
  echo "$(date -u +%FT%TZ) probe8: $PROBE" | tee -a "$LOG"
  OK=$(python - "$PROBE" "$QUIET_AGG8" "$QUIET_WORKER_MIN" <<'EOF'
import json, sys
try:
    d = json.loads(sys.argv[1])
    ok = (d["agg_imgs_per_sec"] >= float(sys.argv[2])
          and min(d["per_worker"]) >= float(sys.argv[3]))
    print(1 if ok else 0)
except Exception:
    print(0)
EOF
)
  if [ "$OK" = "1" ]; then
    echo "$(date -u +%FT%TZ) QUIET window detected -> launching bench_scaling" | tee -a "$LOG"
    python scripts/bench_scaling.py 2>&1 | tee -a "$LOG"
    RC=${PIPESTATUS[0]}
    echo "bench_scaling exited rc=$RC at $(date -u +%FT%TZ)" | tee -a "$LOG"
    if [ "$RC" = "3" ]; then
      # UNMEASURABLE: the window collapsed and bench_scaling aborted
      # without writing artifacts — keep watching for the next window.
      continue
    fi
    exit $RC
  fi
  sleep "$PROBE_SLEEP"
done
