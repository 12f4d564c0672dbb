#!/bin/bash
# Round-5 session-2 queue, part e — the long-ks (seconds-scale slope)
# rerun of every stalled timing item. Methodology: relay-floor-scale
# slope runs are tenancy-hypersensitive (spreads 0.3-27); seconds-
# scale runs of the same kernels reproduce to 0.2% in the same
# windows (BENCHMARKS r5 s2). Trust gates unchanged.
set -u
cd "$(dirname "$0")/.."
OUT=results/hw_queue_r5
STAMP() { date -u +%H:%M:%S; }
LOG="$OUT/queue_s2.log"

run_gated() {
  local name="$1"; shift
  # one quick long-ks calm check; 3 tries then run anyway (per-row
  # adjacency gates inside each probe still refuse poisoned rows)
  for i in 1 2 3; do
    if timeout 600 python scripts/calm_check.py 0.2 50 105 1 \
        >> "$OUT/calm_watch.log" 2>&1; then break; fi
    echo "$(STAMP) $name: check $i poisoned, sleeping 60s" >> "$LOG"
    sleep 60
  done
  echo "$(STAMP) === $name: running ===" >> "$LOG"
  "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  echo "$(STAMP) === $name: rc=$? ===" >> "$LOG"
}

echo "$(STAMP) queue part-e start (long-ks)" >> "$LOG"
run_gated sstep_shape_race3 timeout 3000 python scripts/sstep_shape_race.py
run_gated cliff_bisect6 timeout 3000 python scripts/cliff_bisect6.py
run_gated block_econ_slopes timeout 1800 python scripts/block_econ_slopes.py
echo "$(STAMP) queue part-e done" >> "$LOG"
