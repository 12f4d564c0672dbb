"""Diagnose the N=1e7 banded-CG bandwidth cliff (ROADMAP r3 item 2).

Measured facts (BENCHMARKS.md): flat banded fp32 CG runs at 62-67% of
HBM peak at N=1e6 but only 30% at N=1e7. This probe separates the
suspects with slope measurements of
  (a) a pure elementwise triad loop  (bandwidth control),
  (b) a pure banded mat-vec loop     (matvec fusion),
  (c) the full CG loop               (recurrence fusion),
at several sizes between 1e6 and 1e7.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import slope_seconds_per_iter  # noqa: E402
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.operators import DiaOperator, banded_matvec  # noqa: E402

PEAK = 819e9


@functools.partial(jax.jit, static_argnames=("k",))
def triad_loop(x, k):
    def body(i, y):
        return 1.0000001 * y + x

    return jax.lax.fori_loop(0, k, body, jnp.zeros_like(x))


def make_matvec_loop(bands, offsets):
    @functools.partial(jax.jit, static_argnames=("k",))
    def mv_loop(x, k):
        def body(i, y):
            return banded_matvec(bands, offsets, y) * 1e-6  # keep finite

        return jax.lax.fori_loop(0, k, body, x)

    return mv_loop


def main():
    sizes = [int(float(s)) for s in (sys.argv[1:] or ["1e6", "2e6", "4e6", "1e7"])]
    out = {}
    for n_target in sizes:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        op = DiaOperator(bands, offsets)
        ndiag = bands.shape[0]
        rs = np.random.default_rng(0)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        row = {}

        # (a) triad: traffic 2 floats/element/iter (read y, write y; x
        # stays cached? conservatively 3). The micro-loops are ~10-30
        # us/iter, so the ks must be large enough that the slope
        # signal (~hundreds of iters) dwarfs the relay's multi-ms
        # floor jitter — the session-7 run used (100,200,300) and got
        # negative slopes.
        tri = slope_seconds_per_iter(
            lambda b, k: triad_loop(b, k), make_b,
            ks=(500, 2000, 4000), reps=5,
        )
        row["triad_us"] = tri["s_per_iter"] * 1e6
        row["triad_gbps_3N"] = 3 * n * 4 / tri["s_per_iter"] / 1e9
        row["triad_fit"] = tri["fit_rel_err"]
        row["triad_spread"] = tri["ts_spread"]

        # (b) matvec loop: traffic (ndiag + 2) floats/element/iter
        mvl = make_matvec_loop(bands, offsets)
        mv = slope_seconds_per_iter(
            lambda b, k: mvl(b, k), make_b, ks=(200, 800, 1600), reps=5
        )
        row["matvec_us"] = mv["s_per_iter"] * 1e6
        row["matvec_gbps"] = (ndiag + 2) * n * 4 / mv["s_per_iter"] / 1e9
        row["matvec_pct"] = 100 * row["matvec_gbps"] / 819
        row["matvec_fit"] = mv["fit_rel_err"]
        row["matvec_spread"] = mv["ts_spread"]

        # (c) full CG: traffic (ndiag + 13) floats/element/iter
        cg = slope_seconds_per_iter(
            lambda b, k: cg_solve(op, b, tol=0.0, maxiter=k).x,
            make_b,
            ks=(100, 300, 600),
            reps=5,
        )
        row["cg_us"] = cg["s_per_iter"] * 1e6
        row["cg_gbps"] = (ndiag + 13) * n * 4 / cg["s_per_iter"] / 1e9
        row["cg_pct"] = 100 * row["cg_gbps"] / 819
        row["cg_fit"] = cg["fit_rel_err"]
        row["cg_spread"] = cg["ts_spread"]

        out[str(n)] = row
        print(
            f"# n={n}: triad {row['triad_us']:.0f}us ({row['triad_gbps_3N']:.0f} GB/s @3N)"
            f" | matvec {row['matvec_us']:.0f}us ({row['matvec_pct']:.0f}%)"
            f" | cg {row['cg_us']:.0f}us ({row['cg_pct']:.0f}%)",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
