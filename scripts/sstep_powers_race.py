"""Re-measure s-step powers CG after the band-plane hoist.

Session-8 baseline (newkernels3.json): sstep s=4 with the fused
matrix-powers kernel = 171.9 us/iter at N=1e6 (51%), 1031.6 at N=4e6
(34%), vs 244.1/1227.9 for separate mat-vecs. The per-block band
re-pad (10 words/block = 2.5 words/iter at s=4) has now been hoisted
above the while loop; this re-races both modes.

Usage: python scripts/sstep_powers_race.py [n ...] > out.json
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
from cgx.solver.operators import DiaOperator  # noqa: E402
from cgx.solver.sstep import sstep_cg_solve  # noqa: E402

S = 4


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 4_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, nominal peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "s": S, "rows": []}
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
        # amortized words/iter: basis (ndiag+2+2s+1)/s + recovery
        # ((2s+1)+3)/s + Gram ((2s+1)^2 negligible) — report us/iter
        # and the basis-model utilization like newkernels3 did
        words = (ndiag + 2.0 + (2 * S + 1) + (2 * S + 1) + 3) / S

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        # fixed bounds (as newkernels_probe did): letting the solver
        # estimate them adds a variable-length device Lanczos per call
        # that destroys the slope fit
        bounds = (1e-4, 8.0)
        ks = (96, 192, 384) if n < 4_000_000 else (48, 96, 192)
        for powers in ("off", "pallas"):
            row = {"n": n, "tag": f"sstep_{powers}", "words": words}

            def run(b, k, _p=powers):
                return sstep_cg_solve(
                    op, b, tol=0.0, maxiter=k, s=S, powers=_p,
                    bounds=bounds,
                ).x

            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} sstep_{powers}: {row['us']:.1f}us/iter"
                    f" ({row['pct_nominal']:.0f}% of model)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n} sstep_{powers}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
