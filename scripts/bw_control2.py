"""Achievable-bandwidth ladder + Pallas-vs-XLA control at equal traffic.

bw_control.py found: the 15-word XLA chain sustains 933-974 GB/s —
ABOVE the 819 GB/s nominal spec for "TPU v5 lite" — with tight fits,
while the Pallas streaming CG kernel holds 392-426 GB/s. (copy2/triad3
collapsed: XLA fully unrolls + fuses their one-FMA bodies, so their
slope measures VPU compute, not HBM. The 13-FMA chain is too big to
collapse and its slope scales with n — a genuine bandwidth number.)

This probe (a) maps achieved GB/s vs the read mix with chain(m) for
m = 1, 5, 13, 27 fixed-array reads (words/iter = m+2) — if they
plateau, the plateau IS the chip's achievable streaming bandwidth;
(b) races dia_matvec_stream2d (7 words/iter: 5 bands + x read + y
write) against chain(5) (same 7 words) — Pallas DMA pipeline vs XLA
fusion at identical traffic, which attributes the stream-CG kernel's
~45%-of-achievable gap to either the DMA machinery or the fused-
iteration design.

Usage: python scripts/bw_control2.py [n ...] > out.json
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
from cgx.ops.dia_spmv import dia_matvec_stream2d  # noqa: E402


@functools.partial(jax.jit, static_argnames=("k",))
def chain(y0, xs, k):
    def body(i, y):
        for x in xs:  # y-dependence defeats hoisting; depth defeats unroll
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
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        xs_all = tuple(
            jax.device_put(0.01 * rs.standard_normal(n).astype(np.float32))
            for _ in range(27)
        )
        ks = (32, 64, 128)

        def mv_loop(b, k):
            def body(i, y):
                return dia_matvec_stream2d(
                    bands, y, offsets=offsets
                ) * 1e-6  # keep finite; Pallas call is opaque to fusion

            return jax.jit(
                lambda y0: jax.lax.fori_loop(0, k, body, y0)
            )(b)

        cases = [
            (f"chain{m+2}", float(m + 2),
             lambda b, k, _m=m: chain(b, xs_all[:_m], k))
            for m in (1, 5, 13, 27)
        ] + [
            ("stream2d_mv", float(ndiag + 2), mv_loop),
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
