#!/usr/bin/env bash
# Round-4 session-4 hardware queue — run with an IDLE host (tenancy
# discipline note, BENCHMARKS round-4 session 2).
#   1. fused s-step shape race WITH the bf16 band-plane arm (last
#      session's commit 24b65da landed bands_dtype='auto' for the
#      fused block unmeasured).
#   2. cliff bisect attempt 5: bracket drift + ABSOLUTE sanity gate
#      (stream bracket <= 105% of nominal peak) — closes VERDICT r3
#      item 8 either way (clean curve or environment-bounded).
#   3. off-grid fp64q row with warm median solve times (round-4
#      VERDICT item 6 follow-up).
#   4. single-chip sharded fused s-step smoke: psize=1 mesh exercises
#      the sstep_powers='fused' kernels on real hardware (multi-shard
#      correctness is pinned on the virtual CPU mesh).
#
#   bash scripts/hw_queue_r4s4.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue_r4}"
mkdir -p "$OUT"

if ! timeout 90 python -u -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'"; then
    echo "no TPU reachable; aborting"
    exit 1
fi

echo "== 1. fused s-step shape race + bf16 arm =="
SSTEP_S=4 timeout 3600 python -u scripts/sstep_shape_race.py 4000000 10240000 \
    > "$OUT/sstep_shape_bf16.json" 2> "$OUT/sstep_shape_bf16.log"
echo "exit=$?" >> "$OUT/sstep_shape_bf16.log"

echo "== 2. cliff bisect attempt 5 (drift + absolute gate) =="
timeout 3600 python -u scripts/cliff_bisect2.py \
    250000 360000 490000 640000 810000 \
    > "$OUT/cliff_bisect5.json" 2> "$OUT/cliff_bisect5.log"
echo "exit=$?" >> "$OUT/cliff_bisect5.log"

echo "== 3. off-grid fp64q warm medians =="
timeout 2400 python -u scripts/fp64q_offgrid.py 1024 \
    > "$OUT/fp64q_offgrid3.json" 2> "$OUT/fp64q_offgrid3.log"
echo "exit=$?" >> "$OUT/fp64q_offgrid3.log"

echo "== 4. sharded fused s-step single-chip smoke =="
timeout 1800 python -u scripts/sstep_fused_smoke.py \
    > "$OUT/sstep_fused_smoke.json" 2> "$OUT/sstep_fused_smoke.log"
echo "exit=$?" >> "$OUT/sstep_fused_smoke.log"

echo "== queue s4 done =="
