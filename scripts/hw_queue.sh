#!/usr/bin/env bash
# The pending hardware-measurement queue (docs/ROADMAP.md round-2
# sessions 4-5). Run on a machine with a reachable TPU; every step is
# skippable/resumable. Results land in results/ and BENCHMARKS.md
# should be updated from the printed tables.
#
#   bash scripts/hw_queue.sh [outdir]
#
set -u
cd "$(dirname "$0")/.."
OUT="${1:-results/hw_queue_$(date +%Y%m%d)}"
mkdir -p "$OUT"

echo "== 0. device probe (90 s budget: the tunnel hangs when down) =="
if ! timeout 90 python -u -c "import jax; d=jax.devices(); print(d); assert d[0].platform != 'cpu'"; then
    echo "no TPU reachable; aborting (the queue is hardware-gated)"
    exit 1
fi

echo "== 1. session-4/5 kernel race (slope method): flat vs pipelined"
echo "      vs stream vs stream_pcg; VMEM 1d-vs-2d layout; matrix-powers =="
timeout 3000 python scripts/newkernels_probe.py 2>&1 | tee "$OUT/newkernels.txt"

echo "== 2. headline bench (candidate race, quality-gated) =="
timeout 1200 python bench.py 2>&1 | tee "$OUT/bench.txt"

echo "== 3. banded utilization ladder refresh (N=1e6/1e7 cliff check) =="
timeout 1800 python scripts/stream_probe.py 2>&1 | tee "$OUT/stream.txt" || true
timeout 1800 python scripts/cliff_probe.py 2>&1 | tee "$OUT/cliff.txt" || true

echo "== done. Next actions (docs/ROADMAP.md): flip dispatch defaults on"
echo "   wins (SolveConfig.large_banded, cg_kernel layout default, bench"
echo "   candidates), re-bisect the VMEM2D ceiling, update BENCHMARKS.md =="
