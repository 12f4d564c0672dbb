"""Race the fused streaming s-step solver against the plain streaming
CG kernel (round-3 VERDICT stretch item 9).

Per s iterations the fused pair moves (2*ndiag + 8)N words vs the
stream kernel's 15sN (cgx/ops/sstep_stream.py docstring) — analytic
3.3x at s=4, 6.7x at s=8. This measures what survives contact with the
VPU (the basis is computed twice) on the real chip, slope-method, with
the plain stream kernel interleaved as the drift bracket.

Rows report seconds per CG ITERATION (the s-step solver runs s
iterations per outer block; its slope is per-block and divided by s).

Usage: python scripts/sstep_stream_race.py [n ...] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# x64 on: the s-step coefficient replay promotes its Gram quadratic
# forms to (emulated) fp64 when available — without it the replay
# noise-breaks at these sizes (results/hw_queue_r3/sstep_envelope*.log)
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.ops.sstep_stream import dia_sstep_stream_solve  # noqa: E402
from cgx.solver.chebyshev import spectral_bounds  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_240_000]
    svals = tuple(int(v) for v in os.environ.get(
        "SSTEP_SVALS", "2,4,6").split(","))
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
        bounds = spectral_bounds(op, n)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        def add_row(variant, words_per_iter, s_per_iter, fit, spread):
            gbps = words_per_iter * n * 4 / s_per_iter / 1e9
            row = {
                "n": n, "variant": variant,
                "us_per_iter": s_per_iter * 1e6,
                "gbps_analytic": gbps,
                "pct_peak": 100 * gbps * 1e9 / peak,
                "fit_rel_err": fit, "ts_spread": spread,
            }
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

        # bracket: plain stream kernel (per-iteration words ndiag+10)
        def run_stream(b, k, _op=op):
            return dia_cg_solve_stream(_op, b, tol=0.0, maxiter=k).x

        m = slope_seconds_per_iter(run_stream, make_b, ks=(32, 64, 128),
                                   reps=3)
        add_row("stream", ndiag + 10, m["s_per_iter"], m["fit_rel_err"],
                m["ts_spread"])

        for s in svals:
            def run_ss(b, k, _op=op, _s=s, _bounds=bounds):
                return dia_sstep_stream_solve(
                    _op, b, s=_s, tol=0.0, maxiter=k, bounds=_bounds,
                ).x

            # maxiter counts CG iterations; keep whole blocks
            ks = (8 * s, 16 * s, 32 * s)
            m = slope_seconds_per_iter(run_ss, make_b, ks=ks, reps=3)
            add_row(f"sstep_fused_s{s}", (2 * ndiag + 8) / s,
                    m["s_per_iter"], m["fit_rel_err"], m["ts_spread"])

        # re-bracket
        m = slope_seconds_per_iter(run_stream, make_b, ks=(32, 64, 128),
                                   reps=3)
        add_row("stream_b", ndiag + 10, m["s_per_iter"],
                m["fit_rel_err"], m["ts_spread"])

        # quality gate: fused s-step full solve to an fp32-reachable
        # tolerance matches the plain stream solve's quality
        b = source_term_device(n, jnp.float32)
        b_norm = float(jnp.linalg.norm(b.astype(jnp.float64)))
        gate = {}
        for name, fn in (
            ("stream", lambda: dia_cg_solve_stream(
                op, b, tol=1e-5 * b_norm, maxiter=60000)),
            ("sstep_fused_s4", lambda: dia_sstep_stream_solve(
                op, b, s=4, tol=1e-5 * b_norm, maxiter=60000,
                bounds=bounds)),
        ):
            res = fn()
            r = b - op.matvec(res.x)
            gate[name] = {
                "iterations": int(res.iterations),
                "converged": bool(res.converged),
                "true_rel": float(
                    jnp.linalg.norm(r.astype(jnp.float64)) / b_norm
                ),
            }
        out["rows"].append({"n": n, "gate": gate})
        print(json.dumps({"n": n, "gate": gate}), file=sys.stderr,
              flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
