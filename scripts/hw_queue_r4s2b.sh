#!/usr/bin/env bash
# Round-4 session-2 hardware queue, phase 2 — run with an IDLE host
# (tenancy note in BENCHMARKS round-4 session 2).
#   1. bw_control6 at 4e6 + 1.024e7: does the trivial-compute 10R+5W
#      kernel ALSO drop from 4e6 to 1e7? (attributes the last of the
#      1e7 streaming tail to the memory system vs the CG kernel)
#   2. mg_setup_profile x2 back-to-back: quantifies the halved probe
#      fan-out (exact _coarse_reach) and the persistent-cache hit on
#      the second process.
#   3. cliff_bisect2 with sub-compile-cap sizes for the vmem2d arm
#      (the relay rejects scoped VMEM >~48 MB, i.e. n >~ 9e5).
#
#   bash scripts/hw_queue_r4s2b.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue_r4}"
mkdir -p "$OUT"

if ! timeout 90 python -u -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'"; then
    echo "no TPU reachable; aborting"
    exit 1
fi

echo "== 1. bw_control6 footprint ladder =="
timeout 2400 python -u scripts/bw_control6.py 4000000 10240000 \
    > "$OUT/bw_control6_footprint.json" 2> "$OUT/bw_control6_footprint.log"
echo "exit=$?" >> "$OUT/bw_control6_footprint.log"

echo "== 2. MG setup re-profile (exact reach), twice =="
timeout 2400 python -u scripts/mg_setup_profile.py 3200 \
    > "$OUT/mg_setup_profile2.json" 2> "$OUT/mg_setup_profile2.log"
echo "exit=$?" >> "$OUT/mg_setup_profile2.log"
timeout 1200 python -u scripts/mg_setup_profile.py 3200 \
    > "$OUT/mg_setup_profile3.json" 2> "$OUT/mg_setup_profile3.log"
echo "exit=$?" >> "$OUT/mg_setup_profile3.log"

echo "== 3. cliff bisect, sub-cap vmem arm =="
timeout 3600 python -u scripts/cliff_bisect2.py \
    250000 360000 490000 640000 810000 1000000 1500000 2000000 3000000 4000000 \
    > "$OUT/cliff_bisect4.json" 2> "$OUT/cliff_bisect4.log"
echo "exit=$?" >> "$OUT/cliff_bisect4.log"

echo "== 4. 1e7 tail re-race on the NEW adaptive (512,512) default =="
timeout 2400 python -u scripts/stream_1e7_race.py 10240000 \
    > "$OUT/stream_1e7_race3.json" 2> "$OUT/stream_1e7_race3.log"
echo "exit=$?" >> "$OUT/stream_1e7_race3.log"

echo "== queue phase 2 done =="
