"""Race the split vs stacked streaming-CG kernel layouts on hardware.

bw_control4 showed the DMA machinery can sustain ~achievable HBM
bandwidth with ONE slab stream (planes mat-vec) while the split-buffer
fused iteration sits at ~420-430 GB/s with 3 slab DMAs in + 3 staged
DMAs out. 'stacked' carries r/w/s in one (3, rows_h, cols) array: one
DMA each way per block. Math is bit-identical (interpret-verified).

Usage: python scripts/stream_stacked_race.py [n ...] > out.json
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


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, nominal peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    for n_target in ns:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        op = DiaOperator(
            jnp.asarray(np.asarray(dia.bands, np.float32)),
            tuple(dia.offsets),
        )
        ndiag = op.bands.shape[0]
        words = float(ndiag + 10)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        ks = (64, 128, 256) if n >= 4_000_000 else (128, 256, 512)
        for layout in ("split", "stacked"):
            row = {"n": n, "tag": layout, "words": words}

            def run(b, k, _l=layout):
                return dia_cg_solve_stream(
                    op, b, tol=0.0, maxiter=k, layout=_l
                ).x

            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} {layout}: {row['us']:.1f}us"
                    f" -> {row['gbps']:.0f} GB/s"
                    f" ({row['pct_nominal']:.0f}% nominal)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n} {layout}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
