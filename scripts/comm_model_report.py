"""Analytic communication-model report (VERDICT r1 item 7).

Produces the only honest multi-chip story a one-chip rig can tell:

1. Validates the Thakur-style collective cost model against the
   reference's OWN measured cluster data (fit on p<=32, report the
   per-row prediction ratios, show the un-modelled p=64 DCN cliff).
2. Fits the virtual-mesh rows (documented as software-overhead
   calibration, not ICI).
3. Predicts cgx's strategy crossovers (allgather vs halo vs
   pipelined) on an ICI-class machine at N=1e6.

Writes results/comm_model/{reference_fit.csv, crossover.csv,
comm_model.png} and prints the BENCHMARKS.md table source.

    python scripts/comm_model_report.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cgx.bench.analysis import (
    ScalingTable,
    fit_comm_model_joint,
    halo_comm_model,
    pipelined_comm_model,
    predict_scaling,
    reference_comm_model,
    strategy_crossover,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "results", "comm_model")
REF = "/root/reference/results/strong_scaling.txt"

# ICI-class machine assumptions for the crossover prediction (stated,
# not measured — one chip has no ICI): per-hop latency ~1 us and
# ~4.5e10 B/s per-direction neighbour bandwidth are the right order
# for a v5e 2-D torus ICI link; t1 = measured single-chip fp64
# s/iter at N=1e6 (slope method, BENCHMARKS.md).
ICI_PARAMS = {"t1": 5.2e-4, "alpha": 1.0e-6, "beta": 1.0 / 4.5e10}


def main() -> int:
    os.makedirs(OUT, exist_ok=True)

    # --- 1. reference cluster validation --------------------------------
    ref = ScalingTable.read(REF)
    model = reference_comm_model()
    by_n_fit = {
        n: [(p, t) for p, t in rows if p <= 32]
        for n, rows in ref.by_n.items()
    }
    fit = fit_comm_model_joint(by_n_fit, {n: 1 for n in by_n_fit}, model)
    print(
        f"reference fit (p<=32): alpha={fit['alpha']:.3e} s, "
        f"beta={fit['beta']:.3e} s/B, rel_rms={fit['rel_rms']:.3f}"
    )
    lines = ["N,p,measured_s,predicted_s,ratio"]
    for n in sorted(ref.by_n):
        params = {
            "t1": fit[f"t1:{n}"],
            "alpha": fit["alpha"],
            "beta": fit["beta"],
        }
        pred = dict(
            predict_scaling(model, n, [p for p, _ in ref.by_n[n]], params)
        )
        for p, t_meas in ref.by_n[n]:
            lines.append(
                f"{n},{p},{t_meas:.4f},{pred[p]:.4f},{pred[p] / t_meas:.2f}"
            )
    with open(os.path.join(OUT, "reference_fit.csv"), "w") as f:
        f.write(
            "# Thakur-model joint fit of /root/reference/results/"
            "strong_scaling.txt (fit on p<=32; p=64 rows show the\n"
            "# un-modelled 2-node DCN cliff the reference also calls "
            "out). alpha=%.3e s, beta=%.3e s/B.\n" % (fit["alpha"], fit["beta"])
        )
        f.write("\n".join(lines) + "\n")

    # --- 2. virtual-mesh calibration ------------------------------------
    vm_path = os.path.join(
        os.path.dirname(OUT), "virtual_mesh", "strong_scaling.txt"
    )
    if os.path.exists(vm_path):
        vm = ScalingTable.read(vm_path)
        vm_fit = fit_comm_model_joint(
            vm.by_n, {n: 1 for n in vm.by_n}, model
        )
        print(
            f"virtual-mesh fit: alpha={vm_fit['alpha']:.3e} s (software "
            f"dispatch overhead per shard-step, NOT ICI latency), "
            f"beta={vm_fit['beta']:.3e} s/B, rel_rms={vm_fit['rel_rms']:.3f}"
        )

    # --- 3. cgx strategy crossover on an ICI-class machine --------------
    n = 1_000_000
    bandwidth = 1000  # lap2d_fd(1000) halo width = g
    cross = strategy_crossover(n, bandwidth, ICI_PARAMS)
    lines = ["strategy,p,predicted_s_per_iter"]
    for name, rows in cross.items():
        for p, t in rows:
            lines.append(f"{name},{p},{t:.3e}")
    with open(os.path.join(OUT, "crossover.csv"), "w") as f:
        f.write(
            "# Predicted s/iter of cgx comm strategies on an ICI-class\n"
            "# machine (alpha=%.1e s, beta=%.1e s/B — stated v5e-torus\n"
            "# assumptions; t1 from the measured single-chip slope).\n"
            % (ICI_PARAMS["alpha"], ICI_PARAMS["beta"])
        )
        f.write("\n".join(lines) + "\n")
    print("\nPredicted s/iter at N=1e6 (ICI-class assumptions):")
    ps = [p for p, _ in cross["allgather"]]
    print("p:         " + "  ".join(f"{p:8d}" for p in ps))
    for name, rows in cross.items():
        print(
            f"{name:10s} "
            + "  ".join(f"{t:8.2e}" for _, t in rows)
        )

    # --- figure ---------------------------------------------------------
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(11, 4))
        ax = axes[0]
        for n_sz in (2048, 4096, 8192):
            rows = ref.by_n[n_sz]
            params = {
                "t1": fit[f"t1:{n_sz}"],
                "alpha": fit["alpha"],
                "beta": fit["beta"],
            }
            pred = predict_scaling(
                model, n_sz, [p for p, _ in rows], params
            )
            ax.loglog(
                [p for p, _ in rows], [t for _, t in rows],
                "o", label=f"measured N={n_sz}",
            )
            ax.loglog(
                [p for p, _ in pred], [t for _, t in pred],
                "--", color=ax.lines[-1].get_color(),
            )
        ax.axvline(36, color="gray", lw=0.5)
        ax.set_xlabel("p")
        ax.set_ylabel("solve seconds")
        ax.set_title("Thakur-model fit vs reference cluster data\n"
                     "(dashed = model; fit on p<=32)")
        ax.legend(fontsize=7)

        ax = axes[1]
        for name, rows in cross.items():
            ax.loglog(
                [p for p, _ in rows], [t for _, t in rows], "o-",
                label=name,
            )
        ax.set_xlabel("p")
        ax.set_ylabel("predicted s/iter")
        ax.set_title("cgx strategies, N=1e6 banded, ICI-class machine")
        ax.legend(fontsize=8)
        fig.savefig(
            os.path.join(OUT, "comm_model.png"),
            dpi=120, bbox_inches="tight",
        )
        print(f"\nwrote {OUT}/comm_model.png")
    except ImportError:
        pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
