#!/usr/bin/env bash
# Benchmark sweep launcher — the cgx analogue of the reference's SLURM
# cg.run scripts (MPI/cg.run strong+weak sweeps, CUDA/cg.run kernel
# sweep). Usable directly, under `srun`, or in any batch system: the
# mesh comes from whatever devices JAX sees.
#
#   ./scripts/run_sweeps.sh out_dir [--virtual N]
#
# --virtual N  run on N fake CPU devices (development / CI)
set -euo pipefail
# make cgx importable when not pip-installed
export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd)${PYTHONPATH:+:$PYTHONPATH}"
OUT=${1:-results}
shift || true
if [[ "${1:-}" == "--virtual" ]]; then
    export XLA_FLAGS="--xla_force_host_platform_device_count=${2:-8} ${XLA_FLAGS:-}"
    export CGX_FORCE_CPU=1
fi
mkdir -p "$OUT"

python - "$OUT" <<'PY'
import os, sys
import jax
if os.environ.get("CGX_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")
if jax.default_backend() != "tpu":
    jax.config.update("jax_enable_x64", True)
out = sys.argv[1]
from cgx.bench.sweeps import kernel_sweep, strong_scaling, weak_scaling
nd = len(jax.devices())
counts = [p for p in (1, 2, 4, 8, 16, 32, 64) if p <= nd]
print(f"devices: {nd}, sweep p in {counts}")
# reference grids (MPI/cg.run:15-19, 22-44); sizes trimmed when virtual
sizes = (1024, 2048, 4096, 8192) if jax.default_backend() == "tpu" else (512, 1024)
strong_scaling(sizes=sizes, device_counts=counts,
               out_file=os.path.join(out, "strong_scaling.txt"), fmt="dia")
bases = (1024, 1448, 2048) if jax.default_backend() == "tpu" else (512,)
weak_scaling(base_sizes=bases, device_counts=counts,
             out_file=os.path.join(out, "weak_scaling.txt"), fmt="dia", maxiter=200)
if jax.default_backend() == "tpu":
    kernel_sweep(n=10000, out_file=os.path.join(out, "kernel_sweep.txt"))
print("wrote CSVs to", out)
PY
python -m cgx.bench.report "$OUT/strong_scaling.txt" "$OUT/weak_scaling.txt" "$OUT/figs"
