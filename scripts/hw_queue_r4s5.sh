#!/usr/bin/env bash
# Round-4 session-5 hardware queue — hw_queue_r4s4.sh REORDERED so the
# verdict-closing items run first (the session clock is shorter than
# the queue's worst case, and the shape race — tuning data, tenancy-
# poisoned twice already — is the natural casualty):
#   1. single-chip sharded fused s-step smoke (real Mosaic lowering
#      for the NEW sstep_powers='fused' mesh path; not timing-gated).
#   2. off-grid fp64q warm medians (VERDICT r3 item 6 follow-up; the
#      gate itself already PASSED in fp64q_offgrid2.json).
#   3. cliff bisect attempt 5 with the ABSOLUTE sanity gate (closes
#      VERDICT r3 item 8 either way).
#   4. fused s-step shape race + bf16 arm (longest, least critical —
#      attempts 1-2 were externally tenancy-poisoned, spreads 1-71).
#
#   bash scripts/hw_queue_r4s5.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue_r4}"
mkdir -p "$OUT"

if ! timeout 90 python -u -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'"; then
    echo "no TPU reachable; aborting"
    exit 1
fi

echo "== 1. sharded fused s-step single-chip smoke ($(date -u +%H:%M:%S)) =="
timeout 1800 python -u scripts/sstep_fused_smoke.py \
    > "$OUT/sstep_fused_smoke.json" 2> "$OUT/sstep_fused_smoke.log"
echo "exit=$?" >> "$OUT/sstep_fused_smoke.log"

echo "== 2. off-grid fp64q warm medians ($(date -u +%H:%M:%S)) =="
timeout 2400 python -u scripts/fp64q_offgrid.py 1024 \
    > "$OUT/fp64q_offgrid3.json" 2> "$OUT/fp64q_offgrid3.log"
echo "exit=$?" >> "$OUT/fp64q_offgrid3.log"

echo "== 3. cliff bisect attempt 5 (drift + absolute gate) ($(date -u +%H:%M:%S)) =="
timeout 3000 python -u scripts/cliff_bisect2.py \
    250000 360000 490000 640000 810000 \
    > "$OUT/cliff_bisect5.json" 2> "$OUT/cliff_bisect5.log"
echo "exit=$?" >> "$OUT/cliff_bisect5.log"

echo "== 4. fused s-step shape race + bf16 arm ($(date -u +%H:%M:%S)) =="
SSTEP_S=4 timeout 3600 python -u scripts/sstep_shape_race.py 4000000 10240000 \
    > "$OUT/sstep_shape_bf16.json" 2> "$OUT/sstep_shape_bf16.log"
echo "exit=$?" >> "$OUT/sstep_shape_bf16.log"

echo "== queue s5 done ($(date -u +%H:%M:%S)) =="
