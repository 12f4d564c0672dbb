"""Fused s-step slab-shape + bf16 race — attempt 3 (r5, VERDICT item 3).

Attempts 1-2 (round 4) were externally tenancy-poisoned: negative
Theil-Sen slopes and spreads of 1.1-71 with an idle host
(results/hw_queue_r4/sstep_shape_bf16.json). Pre/post brackets alone
could not refuse rows poisoned by bursts BETWEEN the brackets, so this
attempt applies the r4-verdict prescription: a known-good control (the
plain streaming CG kernel at its tuned default) is slope-measured
immediately before AND after EVERY row (cgx.bench.tenancy), the row is
refused and re-measured when either adjacent control deviates >5% from
its calibrated calm-window value, and each row additionally carries
its own Theil-Sen spread gate. No number from an untrusted row may
enter a results/ table.

Reference anchor: the tuning table for the champion kernel is the
reference's own methodology (/root/reference/results/CUDA_T.txt, 50
rows, produced by CUDA/cg.run:26-30).

Usage: python scripts/sstep_shape_race.py [n ...] > out.json
  env SSTEP_S (default 4), SHAPES (default "512x512,256x512"),
  CONTROL_DEV (default 0.05), ROW_RETRIES (default 3)
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

from cgx.bench.slope import (  # noqa: E402
    chip_hbm_gbps,
    row_trusted,
    slope_seconds_per_iter,
)
from cgx.bench.tenancy import gated_sweep  # noqa: E402
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.ops.sstep_stream import dia_sstep_stream_solve  # noqa: E402
from cgx.solver.chebyshev import spectral_bounds  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_240_000]
    s = int(os.environ.get("SSTEP_S", "4"))
    shapes = [
        tuple(int(v) for v in tok.split("x"))
        for tok in os.environ.get("SHAPES", "512x512,256x512").split(",")
    ]
    control_dev = float(os.environ.get("CONTROL_DEV", "0.05"))
    row_retries = int(os.environ.get("ROW_RETRIES", "3"))
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev} s={s} shapes={shapes}", file=sys.stderr,
          flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "s": s,
           "control_dev": control_dev, "rows": []}
    rs = np.random.default_rng(3)
    for n_target in ns:
        g = int(np.sqrt(n_target))
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        ndiag = op.bands.shape[0]
        bounds = spectral_bounds(op, n)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        def control(_op=op, _mb=make_b):
            """us/iter of the plain stream kernel at its tuned
            default — the adjacency control. ks snake over 2 reps so
            a linear drift cancels; Theil-Sen over the 6 samples."""
            def run_stream(b, k):
                return dia_cg_solve_stream(_op, b, tol=0.0, maxiter=k).x

            m = slope_seconds_per_iter(
                run_stream, _mb, ks=(2000, 4000, 8000), reps=2
            )
            return m["s_per_iter"] * 1e6

        # arms: full-width f32 band planes vs 'auto' bf16 narrowing
        # (bitwise-neutral on the unit stencil); bf16 moves
        # (ndiag + 8)/s words/iter vs (2*ndiag + 8)/s for f32
        arms = [("f32", None, (2 * ndiag + 8) / s),
                ("bf16", "auto", (ndiag + 8) / s)]
        items = [
            (rows, cols, tag, bdt, words)
            for rows, cols in shapes
            for tag, bdt, words in arms
        ]

        def measure_row(item, _op=op, _n=n, _bounds=bounds,
                        _mb=make_b):
            rows, cols, tag, bdt, words = item

            def run_ss(b, k):
                return dia_sstep_stream_solve(
                    _op, b, s=s, tol=0.0, maxiter=k, bounds=_bounds,
                    rows=rows, cols=cols, bands_dtype=bdt,
                ).x

            name = f"sstep_s{s}_{rows}x{cols}_{tag}"
            try:
                # seconds-scale ks (round-5 session-2 methodology fix:
                # relay-floor-scale runs are tenancy-hypersensitive;
                # seconds-scale slopes reproduce to 0.2% in the same
                # windows — BENCHMARKS r5 s2)
                m = slope_seconds_per_iter(
                    run_ss, _mb, ks=(500 * s, 1000 * s, 2000 * s), reps=2
                )
            except Exception as e:  # noqa: BLE001
                return {"n": _n, "variant": name,
                        "err": repr(e)[:160], "spread_ok": False}
            us = m["s_per_iter"] * 1e6
            gbps = words * _n * 4 / m["s_per_iter"] / 1e9
            pct = 100 * gbps * 1e9 / peak
            return {
                "n": _n, "variant": name, "us_per_iter": us,
                "gbps_analytic": gbps, "pct_peak": pct,
                "fit_rel_err": m["fit_rel_err"],
                "ts_spread": m["ts_spread"],
                # the row's own internal gate, on top of adjacency
                "spread_ok": row_trusted(us, m["ts_spread"], pct,
                                         spread_gate=0.25),
            }

        def on_row(row):
            print(json.dumps(row), file=sys.stderr, flush=True)

        rows = gated_sweep(
            items, measure_row, control,
            deviation=control_dev, retries=row_retries,
            recalibrate_every=4, on_row=on_row,
        )
        for row in rows:
            row["trusted"] = bool(
                row.get("row_trusted") and row.get("spread_ok")
            )
        out["rows"].extend(rows)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
