"""Fused s-step slab-shape race at the flagship size (round-4 s2).

The plain streaming kernel's post-alias sweep showed the 1e7 surface
is NOT flat: (512,512) slabs beat (256,512) by 3.8% of peak because
bigger slabs amortize per-block DMA bubbles once state passes ~400 MB
(results/stream_kernel_sweep.txt). The fused s-step champion moves
only 4.5N words/iter, so per-block overheads weigh ~3x MORE per word —
this races its slab shape at N=1.024e7, s=4, with the plain stream
kernel (at ITS tuned default) interleaved as the drift bracket.

Usage: python scripts/sstep_shape_race.py [n ...] > out.json
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
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.ops.sstep_stream import dia_sstep_stream_solve  # noqa: E402
from cgx.solver.chebyshev import spectral_bounds  # noqa: E402

SHAPES = [(256, 512), (512, 512), (1024, 512), (256, 1024)]


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [10_240_000]
    s = int(os.environ.get("SSTEP_S", "4"))
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev} s={s}", file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "s": s, "rows": []}
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

        def add_row(variant, words_per_iter, m):
            gbps = words_per_iter * n * 4 / m["s_per_iter"] / 1e9
            row = {
                "n": n, "variant": variant,
                "us_per_iter": m["s_per_iter"] * 1e6,
                "gbps_analytic": gbps,
                "pct_peak": 100 * gbps * 1e9 / peak,
                "fit_rel_err": m["fit_rel_err"],
                "ts_spread": m["ts_spread"],
            }
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

        def run_stream(b, k, _op=op):
            return dia_cg_solve_stream(_op, b, tol=0.0, maxiter=k).x

        m = slope_seconds_per_iter(run_stream, make_b, ks=(32, 64, 128),
                                   reps=3)
        add_row("stream_bracket_pre", ndiag + 10, m)

        # two arms per shape: full-width f32 band planes vs the 'auto'
        # bf16 narrowing (bitwise-neutral on the unit stencil); the
        # bf16 arm moves (ndiag + 8)/s words/iter vs (2*ndiag + 8)/s
        arms = [("f32", None, (2 * ndiag + 8) / s),
                ("bf16", "auto", (ndiag + 8) / s)]
        for rows, cols in SHAPES:
            for tag, bdt, words in arms:
                def run_ss(b, k, _rows=rows, _cols=cols, _bdt=bdt):
                    return dia_sstep_stream_solve(
                        op, b, s=s, tol=0.0, maxiter=k, bounds=bounds,
                        rows=_rows, cols=_cols, bands_dtype=_bdt,
                    ).x

                ks = (8 * s, 16 * s, 32 * s)
                name = f"sstep_s{s}_{rows}x{cols}_{tag}"
                try:
                    m = slope_seconds_per_iter(run_ss, make_b, ks=ks,
                                               reps=3)
                    add_row(name, words, m)
                except Exception as e:  # noqa: BLE001
                    row = {"n": n, "variant": name, "err": repr(e)[:160]}
                    out["rows"].append(row)
                    print(json.dumps(row), file=sys.stderr, flush=True)

        m = slope_seconds_per_iter(run_stream, make_b, ks=(32, 64, 128),
                                   reps=3)
        add_row("stream_bracket_post", ndiag + 10, m)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
