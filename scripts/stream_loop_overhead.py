"""Locate the fused streaming-CG kernel's missing ~40% of bandwidth.

Facts so far (results/hw_queue_r2s8): the planes mat-vec kernel
sustains ~achievable HBM bandwidth; the fused iteration kernel holds
~50-60% whether its state is split or stacked, and the PCG variant's
2.3x VPU work costs only +13% time — so neither DMA stream count nor
compute is the cap. Remaining suspects:

(a) the while_loop iteration boundary — scalar recurrence between
    pallas calls (SMEM dots out -> XLA scalar ops -> SMEM scal in)
    may serialize with a device-side bubble per iteration;
(b) the kernel itself (e.g. its larger VMEM working set reducing DMA
    overlap).

Discriminator: chain _stream_iteration in a fori_loop with FIXED
scalars (no recurrence, no cond — pure kernel-to-kernel dependency).
If the bare chain reaches ~planes_mv rates, the while_loop boundary is
the cap; if it stays at ~55%, the kernel is.

Usage: python scripts/stream_loop_overhead.py [n ...] > out.json
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
from cgx.ops._util import round_up  # noqa: E402
from cgx.ops.cg_stream import _halo_margin, _stream_iteration  # noqa: E402

ROWS, COLS = 256, 512


@functools.partial(jax.jit, static_argnames=("k", "offsets"))
def chained(bands_pl, p0, x0, r_h, w_h, s_h, k, offsets):
    scal = jnp.asarray([[1e-7, 1e-7]], jnp.float32)  # fixed, tiny: finite

    def body(i, st):
        p, x, rh, wh, sh = st
        rh2, wh2, sh2, p2, x2, _dots = _stream_iteration(
            bands_pl, p, x, rh, wh, sh, scal,
            offsets=offsets, rows=ROWS, cols=COLS, interpret=False,
        )
        return (p2, x2, rh2, wh2, sh2)

    return jax.lax.fori_loop(0, k, body, (p0, x0, r_h, w_h, s_h))[2]


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
        bands = np.asarray(dia.bands, np.float32)
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]
        block = ROWS * COLS
        n_p = round_up(n, block)
        rows_p = n_p // COLS
        m_rows = _halo_margin(offsets, COLS, jnp.float32)
        bands_pl = jnp.asarray(
            np.pad(bands, ((0, 0), (0, n_p - n))).reshape(
                ndiag, rows_p, COLS
            )
        )
        words = float(ndiag + 10)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        p0 = jnp.zeros((rows_p, COLS), jnp.float32)
        x0 = jnp.zeros((rows_p, COLS), jnp.float32)

        def run(b, k):
            b_p = jnp.pad(b, (0, n_p - n))
            halo = jnp.pad(
                b_p, (m_rows * COLS, m_rows * COLS)
            ).reshape(-1, COLS)
            return chained(
                bands_pl, p0, x0, halo, 0.5 * halo, 0.25 * halo, k,
                offsets,
            )

        row = {"n": n, "tag": "bare_chain", "words": words}
        try:
            r = slope_seconds_per_iter(
                run, make_b, ks=(64, 128, 256), reps=5
            )
            row["us"] = r["s_per_iter"] * 1e6
            row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
            row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
            row["fit"] = r["fit_rel_err"]
            row["spread"] = r["ts_spread"]
            print(
                f"#   n={n} bare_chain: {row['us']:.1f}us"
                f" -> {row['gbps']:.0f} GB/s"
                f" ({row['pct_nominal']:.0f}% nominal)"
                f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                file=sys.stderr, flush=True,
            )
        except Exception as e:  # noqa: BLE001
            row["err"] = repr(e)[:160]
            print(f"#   n={n} bare_chain: ERR {row['err']}",
                  file=sys.stderr, flush=True)
        out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
