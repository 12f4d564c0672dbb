#!/bin/bash
# Round-5 session-2 hardware queue. Priority order per VERDICT r4:
#   1. bench.py full rehearsal (items 1+7: trusted driver record)
#   2. block_econ_probe (item 2: replace the invalidated table)
#   3. sstep_shape_race attempt 3 (item 3: champion tuning table)
#   4. cliff_bisect6 (item 6: trusted curve or final closure)
# Each item waits for a calm window first (calm_check: 3 consecutive
# trusted control slopes); probes still gate per-row internally.
# Host must be IDLE while this runs (BENCHMARKS tenancy discipline).
set -u
cd "$(dirname "$0")/.."
OUT=results/hw_queue_r5
mkdir -p "$OUT"
STAMP() { date -u +%H:%M:%S; }

wait_calm() {
  # up to ~2h of waiting per item; 1-of-3 trusted control slopes is
  # enough to start (the probes gate per-row internally)
  for i in $(seq 1 24); do
    if timeout 600 python scripts/calm_check.py 0.2 50 105 1 \
        >> "$OUT/calm_watch.log" 2>&1; then
      echo "$(STAMP) calm window found (check $i)" >> "$OUT/queue_s2.log"
      return 0
    fi
    echo "$(STAMP) still poisoned (check $i), sleeping 120s" \
      >> "$OUT/queue_s2.log"
    sleep 120
  done
  return 1
}

run_item() {
  local name="$1"; shift
  echo "$(STAMP) === $name: waiting for calm window ===" \
    >> "$OUT/queue_s2.log"
  if ! wait_calm; then
    echo "$(STAMP) $name SKIPPED: no calm window in budget" \
      >> "$OUT/queue_s2.log"
    return 1
  fi
  echo "$(STAMP) === $name: running ===" >> "$OUT/queue_s2.log"
  "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  local rc=$?
  echo "$(STAMP) === $name: rc=$rc ===" >> "$OUT/queue_s2.log"
  return $rc
}

echo "$(STAMP) queue start" >> "$OUT/queue_s2.log"

# 1. the driver-record rehearsal: stdout = primary JSON, stderr =
#    secondary/tertiary lines (kept in the .log). No calm wait:
#    bench.py is itself wedge-proof (per-phase deadlines) and
#    trust-gated (spread-gated tertiary with last-trusted fallback) —
#    exactly the conditions of the driver's own end-of-round run.
echo "$(STAMP) === bench_rehearsal: running (no calm wait) ===" \
  >> "$OUT/queue_s2.log"
timeout 2400 python bench.py > "$OUT/bench_rehearsal.json" \
  2> "$OUT/bench_rehearsal.log"
echo "$(STAMP) === bench_rehearsal: rc=$? ===" >> "$OUT/queue_s2.log"

# 2. block-CG economics (rewritten compensated probe, first hw rows)
run_item block_econ timeout 2400 python scripts/block_econ_probe.py \
  --grids 1000,2000 --svals 1,2,4,8

# 3. fused champion tuning table, attempt 3
run_item sstep_shape_race3 timeout 3000 python scripts/sstep_shape_race.py

# 4. cliff bisect, final attempt
run_item cliff_bisect6 timeout 3000 python scripts/cliff_bisect6.py

echo "$(STAMP) queue done" >> "$OUT/queue_s2.log"
