"""N=1e7 streaming-tail race (round-4 VERDICT item 2).

The aliased split-f32 kernel sits at ~75% of HBM peak at N=1.024e7
(vs 90.4% at 4e6). Levers raced here, slope-method with the split-f32
kernel interleaved as the drift bracket:

  split_f32    — baseline (bracket, raced twice)
  split_bf16   — bands_dtype='auto' (bit-exact bf16 band planes:
                 12.5/15 of the traffic) on the ALIASED kernel; the 4e6
                 re-race got the full analytic win, 1e7 was
                 pre-alias-only data
  stacked_f32  — ONE (3, rows_h, cols) state array, 1 slab DMA in +
                 1 staged DMA out per block; best pre-alias 1e7
                 variant, NOW aliased (hardware-validated bitwise vs
                 split: results/hw_queue_r4/stacked_alias.json)
  stacked_bf16 — both levers

Usage: python scripts/stream_1e7_race.py [n ...] > out.json
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
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [10_240_000]
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
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        def add_row(variant, words_per_iter, m):
            gbps = words_per_iter * n * 4 / m["s_per_iter"] / 1e9
            row = {
                "n": n, "variant": variant,
                "us_per_iter": m["s_per_iter"] * 1e6,
                "gbps_analytic": gbps,
                "pct_peak": 100 * gbps * 1e9 / peak,
                "fit_rel_err": m["fit_rel_err"],
                "ts_spread": m["ts_spread"],
            }
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)

        # bf16 'auto' planes: 5 bands at 2 B + 10 f32 state words
        w_f32 = ndiag + 10
        w_bf16 = ndiag / 2 + 10
        variants = [
            ("split_f32", {"layout": "split"}, w_f32),
            ("split_bf16", {"layout": "split", "bands_dtype": "auto"},
             w_bf16),
            ("stacked_f32", {"layout": "stacked"}, w_f32),
            ("stacked_bf16", {"layout": "stacked", "bands_dtype": "auto"},
             w_bf16),
            ("split_f32_b", {"layout": "split"}, w_f32),  # re-bracket
        ]
        for name, kw, words in variants:
            def run(b, k, _kw=kw):
                return dia_cg_solve_stream(
                    op, b, tol=0.0, maxiter=k, **_kw
                ).x

            m = slope_seconds_per_iter(run, make_b, ks=(32, 64, 128),
                                       reps=3)
            add_row(name, words, m)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
