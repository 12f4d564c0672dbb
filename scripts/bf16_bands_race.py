"""Same-session race: bf16 vs fp32 band planes in the streaming CG
kernel (round-3 VERDICT item 2).

The bands are loop-invariant 5N of the 15N words/iter; storing them
bf16 cuts analytic traffic to 12.5N (-17%). Sessions 9-10 acquitted
in-kernel VPU compute as overlapped behind DMA, so the in-kernel
widening (bands_ref[d].astype(f32)) should be free — unlike the
XLA-loop bf16 experiment where conversion traffic materialized in HBM
(BENCHMARKS round-2 variant table). Gates: iteration-count neutrality
and the true-residual check on a full solve (lap2d stencil constants
are bf16-exact, so the rounded operator is the operator).

Arms interleaved fp32 / bf16 / fp32 so relay tenancy drift hits both.

Usage: python scripts/bf16_bands_race.py [n ...] > out.json
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
from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_240_000]
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

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        arms = (
            ("fp32", None, ndiag + 10),
            ("bf16", jnp.bfloat16, 10 + ndiag / 2),
            ("fp32b", None, ndiag + 10),
        )
        for variant, bdt, words in arms:
            def run(b, k, _bdt=bdt, _op=op):
                return dia_cg_solve_stream(
                    _op, b, tol=0.0, maxiter=k, bands_dtype=_bdt
                ).x

            m = slope_seconds_per_iter(run, make_b, ks=(32, 64, 128),
                                       reps=3)
            gbps = words * n * 4 / m["s_per_iter"] / 1e9
            row = {
                "n": n, "variant": variant,
                "us_per_iter": m["s_per_iter"] * 1e6,
                "gbps_analytic": gbps,
                "pct_peak": 100 * gbps * 1e9 / peak,
                "ts_spread": m["ts_spread"],
                "fit_rel_err": m["fit_rel_err"],
            }
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

        # quality gate: full solve to an fp32-reachable tolerance,
        # iteration-count neutrality + device true relative residual
        b = source_term_device(n, jnp.float32)
        b_norm = float(jnp.linalg.norm(b.astype(jnp.float64)))

        @jax.jit
        def true_rel(x, _op=op, _b=b):
            x = x.astype(jnp.float32)
            r = _b - _op.matvec(x)
            return jnp.linalg.norm(r.astype(jnp.float64)) / jnp.linalg.norm(
                _b.astype(jnp.float64)
            )

        gate = {}
        for variant, bdt in (("fp32", None), ("bf16", jnp.bfloat16)):
            res = dia_cg_solve_stream(
                op, b, tol=1e-5 * b_norm, maxiter=60000, bands_dtype=bdt
            )
            gate[variant] = {
                "iterations": int(res.iterations),
                "converged": bool(res.converged),
                "true_rel": float(true_rel(res.x)),
            }
        gate["iter_neutral"] = (
            gate["fp32"]["iterations"] == gate["bf16"]["iterations"]
        )
        out["rows"].append({"n": n, "gate": gate})
        print(json.dumps({"n": n, "gate": gate}), file=sys.stderr,
              flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
