"""CSE-proof achievable-bandwidth ladder (discriminating experiment).

bw_control2's chain(m) ladder measured 1902/1080/812 GB/s at m+2 =
7/15/29 words — chain7 is impossibly above the 819 GB/s nominal spec.
Two hypotheses fit: (a) the chip's real achievable streaming bandwidth
is ~850-950 GB/s and small-m chains still partially collapse, or (b)
XLA unrolls the fori_loop by a factor u and CSEs the loop-INVARIANT
x-array reads across the fused pair (traffic per u iterations = m
reads + 2 y-moves, so every measured number is inflated ~u-fold).

This probe makes the reads iteration-DEPENDENT: each x buffer holds
TWO disjoint halves and iteration i reads half (i % 2) via a traced
dynamic_slice — consecutive iterations read different addresses, so no
unroll factor can share the loads. If chainD(m) reproduces chain(m),
the numbers are real bandwidth; if it halves them, bw_control2 was an
unroll artifact and chainD is the honest ladder.

Usage: python scripts/bw_control3.py [n ...] > out.json
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


@functools.partial(jax.jit, static_argnames=("k", "n"))
def chain_d(y0, xs2, k, n):
    """xs2: tuple of (2n,) buffers; iteration i streams half (i % 2)."""

    def body(i, y):
        off = (i % 2) * n
        for x2 in xs2:
            y = 0.5 * y + jax.lax.dynamic_slice(x2, (off,), (n,))
        return jax.lax.optimization_barrier(y)

    return jax.lax.fori_loop(0, k, body, y0)


@functools.partial(jax.jit, static_argnames=("k", "offsets"))
def mv_loop(b, bands, k, offsets):
    """Pallas streaming mat-vec chained through a fori_loop — the
    Pallas-side control at (ndiag+2) words/iter. The kernel call is
    opaque to fusion, so no unroll/CSE inflation is possible."""
    from cgx.ops.dia_spmv import dia_matvec_stream2d

    def body(i, y):
        return dia_matvec_stream2d(bands, y, offsets=offsets) * 1e-6

    return jax.lax.fori_loop(0, k, body, b)


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, nominal peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    for n in ns:
        xs2_all = tuple(
            jax.device_put(
                0.01 * rs.standard_normal(2 * n).astype(np.float32)
            )
            for _ in range(27)
        )
        from cgx.mats.generators import lap2d_fd

        g = int(np.sqrt(n))
        dia = lap2d_fd(g)
        n_mv = dia.shape[0]
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        ks = (64, 128, 256)
        cases = [
            (f"chainD{m+2}", float(m + 2), n,
             lambda b, k, _m=m: chain_d(b, xs2_all[:_m], k, n))
            for m in (5, 13, 27)
        ] + [
            ("stream2d_mv", float(bands.shape[0] + 2), n_mv,
             lambda b, k: mv_loop(b, bands, k, offsets)),
        ]
        for tag, words, n_row, run in cases:
            row = {"n": n_row, "tag": tag, "words": words}

            def make_b(rep, _n=n_row):
                return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                    _n
                ).astype(np.float32)

            try:
                r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n_row * 4 / r["s_per_iter"] / 1e9
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
