#!/usr/bin/env bash
# Round-4 session-2 hardware queue: the four runs left open by
# session 1 (see docs/ROADMAP.md "Round 4 progress").
#   1. fp64q_offgrid (VERDICT item 6) — gate script FIXED: split-band
#      tw certification + 3-word longdouble cross-check.
#   2. cliff_bisect2 (item 8) — session-1 run was interrupted.
#   3. stream_1e7_profile (item 2) — attribute the 79.6% tail.
#   4. stream_tune on the ALIASED kernel + bf16 arms (item 3) —
#      regenerates the champion tuning table.
#
#   bash scripts/hw_queue_r4s2.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue_r4}"
mkdir -p "$OUT"

if ! timeout 90 python -u -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'"; then
    echo "no TPU reachable; aborting"
    exit 1
fi

echo "== 1. fp64q off-grid row (fixed gate) =="
timeout 1800 python -u scripts/fp64q_offgrid.py 1024 \
    > "$OUT/fp64q_offgrid2.json" 2> "$OUT/fp64q_offgrid2.log"
echo "exit=$?" >> "$OUT/fp64q_offgrid2.log"

echo "== 2. cliff bisect (bracketed) =="
timeout 3000 python -u scripts/cliff_bisect2.py \
    > "$OUT/cliff_bisect3.json" 2> "$OUT/cliff_bisect3.log"
echo "exit=$?" >> "$OUT/cliff_bisect3.log"

echo "== 3. N=1e7 streaming-tail profile attribution =="
timeout 1800 python -u scripts/stream_1e7_profile.py \
    > "$OUT/stream_1e7_profile.json" 2> "$OUT/stream_1e7_profile.log"
echo "exit=$?" >> "$OUT/stream_1e7_profile.log"

echo "== 4. aliased-kernel block-shape sweep (+ bf16 arms) =="
timeout 3600 python -u scripts/stream_tune.py 4000000 10000000 \
    > "$OUT/stream_tune_aliased.json" 2> "$OUT/stream_tune_aliased.log"
echo "exit=$?" >> "$OUT/stream_tune_aliased.log"

echo "== queue done =="
