"""Reproduce the reference's experiment pipeline end-to-end
(cg.run -> results/*.txt -> plots.ipynb), on whatever devices exist.

    # 8 virtual devices on CPU:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/reproduce_reference_figures.py out/

Produces out/strong_scaling.txt, out/weak_scaling.txt (reference CSV
schemas), prints the speedup/efficiency tables with fitted Amdahl
fractions, and writes the figure set if matplotlib is available.
"""

import os
import sys

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_enable_x64", True)

from cgx.bench.report import main as report_main
from cgx.bench.sweeps import strong_scaling, weak_scaling


def main(out_dir: str = "out") -> int:
    os.makedirs(out_dir, exist_ok=True)
    nd = len(jax.devices())
    counts = [p for p in (1, 2, 4, 8, 16, 32, 64) if p <= nd]
    print(f"devices: {nd} ({jax.devices()[0].platform}); sweep p in {counts}")

    strong_path = os.path.join(out_dir, "strong_scaling.txt")
    weak_path = os.path.join(out_dir, "weak_scaling.txt")
    for p in (strong_path, weak_path):
        if os.path.exists(p):
            os.remove(p)

    # smaller grid than the reference's (1024..8192) so the example runs
    # in minutes on CPU; pass bigger sizes on real hardware
    strong_scaling(
        sizes=(512, 1024), device_counts=counts, out_file=strong_path, fmt="dia",
        tol=1e-8,
    )
    weak_scaling(
        base_sizes=(512,), device_counts=counts, out_file=weak_path, fmt="dia",
        maxiter=200,
    )
    return report_main([strong_path, weak_path, os.path.join(out_dir, "figs")])


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "out"))
