"""Tile sweep for the HBM-streaming fused-iteration CG kernel.

Session-8 hardware race put dia_cg_solve_stream at 52%/49% of HBM
roofline (N=4e6/1e7) with the default (rows=256, cols=512) block —
2x the XLA-fused loop, but with headroom to the analytic 15N-word
ceiling. This sweeps the block shape via the slope method (the
reference's own tuning artifact is its (threads, BLOCK_WIDTH) sweep,
results/CUDA_T.txt: 38.94 s -> 0.8224 s across configs).

Usage: python scripts/stream_tune.py [n ...] > out.json
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
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402

CONFIGS = [
    (256, 512),
    (512, 512),
    (1024, 512),
    (256, 1024),
    (512, 1024),
    (128, 512),
]


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    print(f"# device {jax.devices()[0].device_kind}, peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": jax.devices()[0].device_kind, "peak_gbps": peak / 1e9,
           "rows_cols": []}
    for n_target in ns:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        op = DiaOperator(
            jnp.asarray(np.asarray(dia.bands, np.float32)),
            tuple(dia.offsets),
        )
        rs = np.random.default_rng(0)

        def make_b(rep):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(n).astype(
                np.float32
            )

        ndiag = op.bands.shape[0]
        ks = (64, 128, 256) if n >= 4_000_000 else (128, 256, 512)
        # f32 shapes + a bf16-auto arm at each shape (12.5/15 traffic)
        arms = [(r, c, None) for r, c in CONFIGS]
        arms += [(r, c, "auto") for r, c in CONFIGS[:3]]
        for rows, cols, bdt in arms:
            words = (ndiag / 2 if bdt else ndiag) + 10.0
            stream_bytes = words * n * 4
            row = {"n": n, "rows": rows, "cols": cols,
                   "bands": bdt or "f32"}

            def run(b, k, _bdt=bdt):
                return dia_cg_solve_stream(
                    op, b, tol=0.0, maxiter=k, rows=rows, cols=cols,
                    bands_dtype=_bdt,
                ).x

            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
                row["us"] = r["s_per_iter"] * 1e6
                row["pct"] = stream_bytes / r["s_per_iter"] / peak * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} ({rows},{cols}): {row['us']:.1f}us"
                    f" ({row['pct']:.0f}%) fit {row['fit']:.3f}"
                    f" spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n} ({rows},{cols}): ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows_cols"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
