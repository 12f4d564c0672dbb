#!/usr/bin/env bash
# Session-7 follow-up chain: wait for the in-flight cliff_probe to
# release the chip, then (serially — the timing probes must not share
# the chip) capture full Mosaic errors for the failing kernels and
# re-run the noisy stages with the hardened Theil-Sen estimator.
set -u
cd "$(dirname "$0")/.."
OUT="results/hw_queue_r2s7"
WAIT_PID="${1:-}"

if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

echo "== mosaic repros =="
for case_n in "stream 1e6" "stream_pcg 1e6" "vmem2d 2.4e6" "powers 1e6"; do
    set -- $case_n
    echo "-- $1 $2"
    timeout 900 python scripts/mosaic_repro.py "$1" "$2" \
        > "$OUT/mosaic_$1.txt" 2>&1
    tail -2 "$OUT/mosaic_$1.txt"
done

echo "== cliff rerun (Theil-Sen, scaled ks) =="
timeout 3000 python scripts/cliff_probe.py > "$OUT/cliff2.txt" 2>&1
tail -5 "$OUT/cliff2.txt"

echo "== vmem2d rerun (Theil-Sen) =="
timeout 2400 python scripts/newkernels_probe.py vmem2d \
    > "$OUT/newkernels2_vmem2d.txt" 2>&1
tail -6 "$OUT/newkernels2_vmem2d.txt"

echo "== chain done =="
