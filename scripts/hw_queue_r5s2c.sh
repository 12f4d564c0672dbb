#!/bin/bash
# Round-5 session-2 hardware queue, part b (bench rehearsal done):
#   1. block_econ_probe — bounded calm wait, then run REGARDLESS: its
#      core finding (iterations-to-quality-target) is deterministic;
#      only the s/iter slopes carry tenancy risk and they are marked
#      by their own fit_rel_err.
#   2. sstep_shape_race attempt 3 — pure timing: strict calm wait.
#   3. cliff_bisect6 — pure timing: strict calm wait.
# Host must be IDLE while this runs (BENCHMARKS tenancy discipline).
set -u
cd "$(dirname "$0")/.."
OUT=results/hw_queue_r5
mkdir -p "$OUT"
STAMP() { date -u +%H:%M:%S; }
LOG="$OUT/queue_s2.log"

wait_calm() {
  local checks="$1"
  for i in $(seq 1 "$checks"); do
    if timeout 600 python scripts/calm_check.py 0.2 50 105 1 \
        >> "$OUT/calm_watch.log" 2>&1; then
      echo "$(STAMP) calm window found (check $i)" >> "$LOG"
      return 0
    fi
    echo "$(STAMP) still poisoned (check $i/$checks), sleeping 120s" \
      >> "$LOG"
    sleep 120
  done
  return 1
}

echo "$(STAMP) queue part-c start (econ immediately)" >> "$LOG"

# 1. block econ: bounded wait (~40 min), then run regardless
echo "$(STAMP) === block_econ: bounded calm wait ===" >> "$LOG"
true || echo "$(STAMP) block_econ: no calm window, running anyway \
(iters-to-quality is tenancy-independent)" >> "$LOG"
echo "$(STAMP) === block_econ: running ===" >> "$LOG"
timeout 2700 python scripts/block_econ_probe.py --grids 1000,2000 \
  --svals 1,2,4,8 > "$OUT/block_econ.json" 2> "$OUT/block_econ.log"
echo "$(STAMP) === block_econ: rc=$? ===" >> "$LOG"

# 2. shape race: strict calm wait (pure timing)
echo "$(STAMP) === sstep_shape_race3: waiting for calm ===" >> "$LOG"
if wait_calm 20; then
  echo "$(STAMP) === sstep_shape_race3: running ===" >> "$LOG"
  timeout 3000 python scripts/sstep_shape_race.py \
    > "$OUT/sstep_shape_race3.json" 2> "$OUT/sstep_shape_race3.log"
  echo "$(STAMP) === sstep_shape_race3: rc=$? ===" >> "$LOG"
else
  echo "$(STAMP) sstep_shape_race3 SKIPPED: no calm window" >> "$LOG"
fi

# 3. cliff bisect: strict calm wait (pure timing)
echo "$(STAMP) === cliff_bisect6: waiting for calm ===" >> "$LOG"
if wait_calm 12; then
  echo "$(STAMP) === cliff_bisect6: running ===" >> "$LOG"
  timeout 3000 python scripts/cliff_bisect6.py \
    > "$OUT/cliff_bisect6.json" 2> "$OUT/cliff_bisect6.log"
  echo "$(STAMP) === cliff_bisect6: rc=$? ===" >> "$LOG"
else
  echo "$(STAMP) cliff_bisect6 SKIPPED: no calm window" >> "$LOG"
fi

echo "$(STAMP) queue part-b done" >> "$LOG"
