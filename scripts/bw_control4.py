"""Chained local mat-vec race: XLA vs pre-padded-planes Pallas kernel.

Validates the sharded local_kernel='stream2d' routing claim on real
hardware. bw_control3 showed the OLD dia_matvec_stream2d wrapper at
128-158 GB/s in chained use (per-call band re-pad, not hoistable);
this races the FIXED planes-level entry (band planes built once,
carried through the loop — exactly how _DiaHalo now consumes it)
against the XLA banded mat-vec that the 'xla' local path uses.

Traffic models: XLA mat-vec (ndiag+2) words/iter; planes kernel
(ndiag+2) + 2 for the per-call x halo pad (the only remaining
wrapper cost).

Usage: python scripts/bw_control4.py [n ...] > out.json
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
from cgx.ops.dia_spmv import (  # noqa: E402
    dia_matvec_stream2d_planes,
    stream2d_band_planes,
)
from cgx.solver.operators import banded_matvec  # noqa: E402


@functools.partial(jax.jit, static_argnames=("k", "offsets"))
def xla_loop(b, bands, k, offsets):
    def body(i, y):
        return jax.lax.optimization_barrier(
            banded_matvec(bands, offsets, y) * 1e-6
        )

    return jax.lax.fori_loop(0, k, body, b)


@functools.partial(jax.jit, static_argnames=("k", "offsets"))
def planes_loop(b, planes, k, offsets):
    def body(i, y):
        return dia_matvec_stream2d_planes(
            planes, y, offsets=offsets
        ) * 1e-6

    return jax.lax.fori_loop(0, k, body, b)


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
        planes = jnp.asarray(
            stream2d_band_planes(np.asarray(dia.bands, np.float32))
        )
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        ks = (64, 128, 256)
        cases = [
            ("xla_mv", float(ndiag + 2),
             lambda b, k: xla_loop(b, bands, k, offsets)),
            ("planes_mv", float(ndiag + 4),
             lambda b, k: planes_loop(b, planes, k, offsets)),
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
