"""Slope-only re-measure of block-CG s/iter (g=1000, s in 1,2,4,8)
with per-row adjacency control gating — the wall-clock half of the
round-5 econ adjudication (the iteration-count half is deterministic
and already recorded; results/hw_queue_r5/block_econ.log).

Usage: python scripts/block_econ_slopes.py > out.json
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
from cgx.bench.tenancy import gated_sweep  # noqa: E402
from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.blockcg import block_cg_solve  # noqa: E402

from block_econ_probe import _family  # noqa: E402


def main():
    g = int(os.environ.get("ECON_G", "1000"))
    svals = [int(v) for v in os.environ.get("ECON_S", "1,2,4,8").split(",")]
    n = g * g
    op = lap2d_operator(g, jnp.float32)
    ndiag = op.bands.shape[0]
    b = source_term_device(n, jnp.float32)
    peak = chip_hbm_gbps()
    rng = np.random.default_rng(5)

    def make_stream_b(rep):
        return (1.0 + 0.01 * rep) * rng.standard_normal(n).astype(np.float32)

    def control():
        def run_stream(bb, k):
            return dia_cg_solve_stream(op, bb, tol=0.0, maxiter=k).x

        m = slope_seconds_per_iter(
            run_stream, make_stream_b, ks=(2000, 4000, 8000), reps=2
        )
        return m["s_per_iter"] * 1e6

    def measure_row(s):
        bs = _family(b, s) if s > 1 else b[:, None]

        def run(bi, k):
            return block_cg_solve(op, bi, tol=0.0, maxiter=k).x

        def make_b(rep):
            key = jax.random.PRNGKey(500 + rep)
            noise = jax.random.normal(key, bs.shape, bs.dtype)
            return np.asarray(bs * (1 + 1e-6) + 1e-6 * noise)

        m = slope_seconds_per_iter(run, make_b, ks=(1000, 2000, 4000), reps=2)
        words = ndiag * n + 7 * n * s
        return {
            "s": s,
            "us_per_block_iter": m["s_per_iter"] * 1e6,
            "us_per_iter_per_rhs": m["s_per_iter"] * 1e6 / s,
            "gbps_analytic": 4 * words / m["s_per_iter"] / 1e9,
            "pct_peak": 400 * words / m["s_per_iter"] / 1e9 / peak,
            "fit_rel_err": m["fit_rel_err"],
            "ts_spread": m["ts_spread"],
            "spread_ok": m["ts_spread"] <= 0.25,
        }

    def on_row(row):
        print(json.dumps(row), file=sys.stderr, flush=True)

    rows = gated_sweep(
        svals, measure_row, control,
        deviation=0.05, retries=3, recalibrate_every=4, on_row=on_row,
    )
    for row in rows:
        row["trusted"] = bool(row.get("row_trusted") and row.get("spread_ok"))
    json.dump({"g": g, "n": n, "peak_gbps": peak, "rows": rows},
              sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
