"""End-to-end sharded local_kernel race on real hardware (1-chip mesh).

Validates that the planes-layout Pallas local mat-vec compiles and wins
INSIDE shard_map on the device (the CPU-mesh CI runs it in interpret
mode only), and measures the product-level per-iteration gain of
sharded_cg_solve(local_kernel='stream2d') over 'xla' — the full
iteration including psums (degenerate on 1 shard) and XLA vector ops,
not just the isolated mat-vec (scripts/bw_control4.py measured that
at 7x).

Usage: python scripts/sharded_lk_race.py [n ...] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.parallel.sharded_cg import sharded_cg_solve  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000]
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
        ndiag = len(dia.offsets)
        words = float(ndiag + 13)  # full reference-method CG iteration

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        ks = (32, 64, 128)
        for lk in ("xla", "stream2d"):
            row = {"n": n, "tag": f"sharded_{lk}", "words": words}

            def run(b, k, _lk=lk):
                return sharded_cg_solve(
                    dia, np.asarray(b), n_devices=1, strategy="halo",
                    tol=0.0, maxiter=k, local_kernel=_lk,
                ).x

            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=3)
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} sharded_{lk}: {row['us']:.1f}us/iter"
                    f" -> {row['gbps']:.0f} GB/s"
                    f" ({row['pct_nominal']:.0f}% nominal)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:200]
                print(f"#   n={n} sharded_{lk}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
