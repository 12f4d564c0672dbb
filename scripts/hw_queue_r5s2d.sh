#!/bin/bash
# Round-5 session-2 queue, part d: block-econ wall-clock slopes
# (the iteration-economy half landed; this is the timing half).
set -u
cd "$(dirname "$0")/.."
OUT=results/hw_queue_r5
STAMP() { date -u +%H:%M:%S; }
LOG="$OUT/queue_s2.log"

echo "$(STAMP) queue part-d start" >> "$LOG"
for i in $(seq 1 8); do
  if timeout 600 python scripts/calm_check.py 0.2 50 105 1 \
      >> "$OUT/calm_watch.log" 2>&1; then
    echo "$(STAMP) part-d calm window (check $i)" >> "$LOG"
    break
  fi
  echo "$(STAMP) part-d still poisoned (check $i/8), sleeping 120s" >> "$LOG"
  sleep 120
done
echo "$(STAMP) === block_econ_slopes: running ===" >> "$LOG"
timeout 1800 python scripts/block_econ_slopes.py \
  > "$OUT/block_econ_slopes.json" 2> "$OUT/block_econ_slopes.log"
echo "$(STAMP) === block_econ_slopes: rc=$? ===" >> "$LOG"
echo "$(STAMP) queue part-d done" >> "$LOG"
