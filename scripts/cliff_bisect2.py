"""vmem2d <-> stream routing-cliff bisect, bracket-disciplined
(round-4 VERDICT item 8; closes round-2 item 7).

The r3 attempt (results/hw_queue_r3/cliff_bisect.json) was
tenancy-poisoned (a 113%-of-peak row, 8-12x-over-peak controls). This
re-run applies the method that made the s-step races readable: at each
N the STREAM kernel is measured immediately before and after the
candidates, so drift is visible in-band; rows whose surrounding
brackets disagree by more than the gate are flagged distrusted.

Candidates per N: the whole-solve VMEM kernel (vmem2d — skipped once
its scoped footprint exceeds the budget), the XLA-fused while loop,
and the aliased streaming kernel (the bracket itself).

Usage: python scripts/cliff_bisect2.py [n ...] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.config import VMEM_BUDGET_BYTES  # noqa: E402
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_kernel import dia_cg_solve_vmem, vmem2d_scoped_bytes  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402

BRACKET_GATE = 0.15  # brackets must agree to 15% for a trusted row

# attempt-4 lesson (results/hw_queue_r4/cliff_bisect4.json): drift
# alone is not sufficient — a tenancy burst BETWEEN the brackets
# produced "trusted" rows at 140-290% of peak. Two additional gates:
# the bracket must land at a physically possible rate, and the slope
# fits themselves must be clean.
PCT_SANE = (20.0, 105.0)  # plausible stream %-of-peak window
FIT_GATE = 0.15


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [
        1_000_000, 1_500_000, 2_000_000, 2_500_000, 3_000_000, 4_000_000,
    ]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}", file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    for n_target in ns:
        g = int(np.sqrt(n_target))
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        ndiag = op.bands.shape[0]
        stream_words = ndiag + 10

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        # adaptive iteration counts: at small n a k=256 run is ~10 ms
        # wall — the same order as the ~30-45 ms dispatch floor — and
        # the slope fit turns fragile (attempt 4 produced a NEGATIVE
        # per-iter at n=2.5e5). Size k so the largest run holds
        # ~150 ms of roofline-model device time.
        t_iter_est = stream_words * n * 4 / (0.8 * peak)
        k_max = max(256, int(0.15 / t_iter_est) // 64 * 64)
        ks_adaptive = (k_max // 4, k_max // 2, k_max)

        def measure(fn, ks=None):
            return slope_seconds_per_iter(
                fn, make_b, ks=ks or ks_adaptive, reps=3
            )

        def run_stream(b, k):
            return dia_cg_solve_stream(op, b, tol=0.0, maxiter=k).x

        def run_xla(b, k):
            return cg_solve(op, b, tol=0.0, maxiter=k, history=0).x

        def run_vmem(b, k):
            return dia_cg_solve_vmem(op, b, tol=0.0, maxiter=k).x

        row = {"n": n}
        pre = measure(run_stream)
        row["bracket_pre_us"] = pre["s_per_iter"] * 1e6

        scoped = vmem2d_scoped_bytes(ndiag, n, 4, 4)
        row["vmem2d_scoped_mb"] = round(scoped / 2**20, 1)
        # the relay's chipless AOT helper rejects scoped-VMEM programs
        # past ~48 MB (bisected 46.4 ok / 51.8 HTTP 500, session 2) —
        # don't burn queue minutes re-proving it at every size
        if scoped > 48 * 2**20:
            row["vmem2d_us"] = None
            row["vmem2d_skip"] = "relay ~48MB scoped-VMEM compile cap"
        elif scoped <= VMEM_BUDGET_BYTES:
            try:
                m = measure(run_vmem)
                row["vmem2d_us"] = m["s_per_iter"] * 1e6
                row["vmem2d_spread"] = m["ts_spread"]
            except Exception as e:  # noqa: BLE001
                row["vmem2d_err"] = repr(e)[:160]
        else:
            row["vmem2d_us"] = None

        m = measure(run_xla)
        row["xla_us"] = m["s_per_iter"] * 1e6
        row["xla_spread"] = m["ts_spread"]

        post = measure(run_stream)
        row["bracket_post_us"] = post["s_per_iter"] * 1e6
        row["stream_us"] = (row["bracket_pre_us"]
                            + row["bracket_post_us"]) / 2
        row["stream_pct_peak"] = (
            100 * stream_words * n * 4 / (row["stream_us"] / 1e6) / peak
        )
        denom = min(row["bracket_pre_us"], row["bracket_post_us"])
        drift = (float("inf") if denom <= 0 else
                 abs(row["bracket_pre_us"] - row["bracket_post_us"])
                 / denom)
        row["bracket_drift"] = drift
        row["bracket_fits"] = [pre["fit_rel_err"], post["fit_rel_err"]]
        row["trusted"] = (
            drift < BRACKET_GATE
            and PCT_SANE[0] <= row["stream_pct_peak"] <= PCT_SANE[1]
            and max(row["bracket_fits"]) < FIT_GATE
        )
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
