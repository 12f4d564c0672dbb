"""Pallas write-mix control: trivial 10R+5W streaming kernels.

The XLA chainW controls collapse under the optimizer (fits 0.7-1.0,
apparent 3+ TB/s). This measures the 10-read/5-write mix — the fused
streaming-CG kernel's exact traffic shape — with Pallas kernels that
do nothing but stream:

  mix_auto    x (10, rows, cols) block in, y (5, rows, cols) out, all
              BlockSpec auto-pipelined; body = 5 adds.
  mix_manual  same traffic but inputs DMA'd manually from ANY with a
              CG-style halo'd double-buffered slab + manually staged
              outputs — the fused kernel's machinery without its math.

A tiny SMEM scalar chains iterations (no CSE; negligible traffic).
If both land at ~420-450 GB/s the fused CG kernel is AT the chip's
mixed-stream roofline; if mix_auto ~800 but mix_manual ~430, the
manual DMA pipeline is the cap; if both ~800, the CG kernel's compute
scheduling is.

Usage: python scripts/bw_control6.py [n ...] > out.json
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.ops._util import round_up, sublanes  # noqa: E402

ROWS, COLS = 256, 512
NR, NW = 10, 5  # reads, writes per element


def _auto_kernel(x_ref, s_ref, y_ref):
    s = s_ref[0, 0]
    for t in range(NW):
        y_ref[t] = x_ref[2 * t] + s * x_ref[2 * t + 1]


@functools.partial(jax.jit, static_argnames=("rows_p",))
def mix_auto(x, s, rows_p):
    return pl.pallas_call(
        _auto_kernel,
        grid=(rows_p // ROWS,),
        in_specs=[
            pl.BlockSpec((NR, ROWS, COLS), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((NW, ROWS, COLS), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NW, rows_p, COLS), jnp.float32),
    )(x, s)


def _manual_kernel(m_rows, x_hbm, s_ref, y_hbm, slab, stage, sems, osems):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = ROWS + 2 * m_rows

    def in_copy(jj, slot):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(jj * ROWS, height), :],
            slab.at[slot], sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        in_copy(0, 0).start()

    @pl.when(j + 1 < nb)
    def _():
        in_copy(j + 1, (j + 1) % 2).start()

    in_copy(j, j % 2).wait()
    slot = j % 2
    s = s_ref[0, 0]

    def out_copy(jj, oslot):
        return pltpu.make_async_copy(
            stage.at[oslot],
            y_hbm.at[:, pl.ds(jj * ROWS, ROWS), :],
            osems.at[oslot],
        )

    @pl.when(j >= 2)
    def _():
        out_copy(j - 2, j % 2).wait()

    for t in range(NW):
        stage[j % 2, t] = (
            slab[slot, 2 * t, m_rows : m_rows + ROWS, :]
            + s * slab[slot, 2 * t + 1, m_rows : m_rows + ROWS, :]
        )
    out_copy(j, j % 2).start()

    @pl.when(j == nb - 1)
    def _():
        if nb >= 2:
            out_copy(j - 1, (j - 1) % 2).wait()
        out_copy(j, j % 2).wait()


@functools.partial(jax.jit, static_argnames=("rows_p", "m_rows"))
def mix_manual(x_h, s, rows_p, m_rows):
    height = ROWS + 2 * m_rows
    return pl.pallas_call(
        functools.partial(_manual_kernel, m_rows),
        grid=(rows_p // ROWS,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((NW, rows_p, COLS), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, NR, height, COLS), jnp.float32),
            pltpu.VMEM((2, NW, ROWS, COLS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )(x_h, s)


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, nominal peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    m_rows = sublanes(jnp.float32)  # minimal halo'd margin, CG-style
    for n_target in ns:
        n_p = round_up(n_target, ROWS * COLS)
        rows_p = n_p // COLS
        words = float(NR + NW)
        x10 = jax.device_put(
            (0.01 * rs.standard_normal(NR * rows_p * COLS)).astype(
                np.float32
            ).reshape(NR, rows_p, COLS)
        )
        x10h = jax.device_put(
            (0.01 * rs.standard_normal(
                NR * (rows_p + 2 * m_rows) * COLS
            )).astype(np.float32).reshape(NR, rows_p + 2 * m_rows, COLS)
        )

        def make_b(rep):
            return np.asarray([[1e-30 * (rep + 2)]], np.float32)

        # x rides as an ARGUMENT, not a closure: a closed-over device
        # array is baked into the program as a constant and shipped in
        # the remote-compile payload (HTTP 413 at n=1e7, 600 MB)
        @functools.partial(jax.jit, static_argnames=("k", "mode"))
        def loop(x_arg, s0, k, mode):
            def body(i, s):
                if mode == "auto":
                    y = mix_auto(x_arg, s, rows_p)
                else:
                    y = mix_manual(x_arg, s, rows_p, m_rows)
                return s * 0.5 + y[0, 0, 0] * 1e-30 + 1e-30

            return jax.lax.fori_loop(0, k, body, s0)

        for tag in ("auto", "manual"):
            row = {"n": n_p, "tag": f"mix_{tag}", "words": words}
            x_arg = x10 if tag == "auto" else x10h

            def run(b, k, _t=tag, _x=x_arg):
                return loop(_x, jnp.asarray(b), k, _t)

            try:
                r = slope_seconds_per_iter(
                    run, make_b, ks=(64, 128, 256), reps=5
                )
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n_p * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n_p} mix_{tag}: {row['us']:.1f}us"
                    f" -> {row['gbps']:.0f} GB/s"
                    f" ({row['pct_nominal']:.0f}% nominal)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n_p} mix_{tag}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
