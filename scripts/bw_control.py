"""Achievable-HBM-bandwidth control for the streaming-kernel numbers.

The session-8 tile sweep showed dia_cg_solve_stream is flat at 48-53%
of the v5e's NOMINAL 819 GB/s at every block shape — i.e. bandwidth
bound. The honest question is what fraction of *achievable* mixed
read/write streaming bandwidth that is: no real chip sustains its
vendor sheet number on large-footprint streams. This probe measures
XLA elementwise streaming loops with exactly known traffic:

  copy2    y = 0.999*y + 1e-9            -> 2 words/elem (1R+1W)
  triad3   y = 0.999*y + x0              -> 3 words/elem (2R+1W)
  chain15  y = f(y, x1..x13) chained     -> 15 words/elem (14R+1W)

chain15's word count matches the analytic traffic model of one fused
streaming-CG iteration ((ndiag+10) = 15 words at 5 bands), so its
achieved GB/s is the apples-to-apples denominator for the kernel's
utilization. The chain threads y through every read so XLA's
while-loop invariant code motion cannot hoist the loads; each body
fuses to ONE elementwise pass over n, and an optimization_barrier
caps every iteration so consecutive iterations cannot fuse into one
register-resident pass (first run without it measured 38 TB/s —
i.e. not touching HBM; the real CG loop cannot fuse this way because
its reductions feed the scalar recurrence). The stream kernel itself
is co-measured in the same session so relay tenancy drift cannot
skew the comparison.

Usage: python scripts/bw_control.py [n ...] > out.json
"""

import functools
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

NREAD_CHAIN = 13  # chain15 = 13 fixed reads + y read + y write


@functools.partial(jax.jit, static_argnames=("k",))
def copy2(y0, k):
    def body(i, y):
        return jax.lax.optimization_barrier(0.999 * y + 1e-9)

    return jax.lax.fori_loop(0, k, body, y0)


@functools.partial(jax.jit, static_argnames=("k",))
def triad3(y0, x0, k):
    def body(i, y):
        return jax.lax.optimization_barrier(0.999 * y + x0)

    return jax.lax.fori_loop(0, k, body, y0)


@functools.partial(jax.jit, static_argnames=("k",))
def chain15(y0, xs, k):
    def body(i, y):
        for x in xs:  # y-dependence defeats loop-invariant hoisting
            y = 0.5 * y + x
        return jax.lax.optimization_barrier(y)

    return jax.lax.fori_loop(0, k, body, y0)


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

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        xs = tuple(
            jax.device_put(0.01 * rs.standard_normal(n).astype(np.float32))
            for _ in range(NREAD_CHAIN)
        )
        ks = (64, 128, 256)
        cases = [
            ("copy2", 2.0, lambda b, k: copy2(b, k)),
            ("triad3", 3.0, lambda b, k: triad3(b, xs[0], k)),
            ("chain15", float(NREAD_CHAIN + 2), lambda b, k: chain15(b, xs, k)),
            (
                "stream_cg",
                float(ndiag + 10),
                lambda b, k: dia_cg_solve_stream(op, b, tol=0.0, maxiter=k).x,
            ),
        ]
        for tag, words, run in cases:
            row = {"n": n, "tag": tag, "words": words}
            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} {tag}: {row['us']:.1f}us"
                    f" -> {row['gbps']:.0f} GB/s"
                    f" ({row['pct_nominal']:.0f}% nominal)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n} {tag}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
