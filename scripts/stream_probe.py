"""Measure the streaming DIA mat-vec vs the XLA shifted-AXPY fallback
above the VMEM cliff (ROADMAP r3 item 2 follow-up).

cliff_probe.py established: flat banded fp32 CG drops from 73% of HBM
peak at N=1e6 to ~30% above N=2e6, and at N=1e7 the mat-vec alone is
2926 us (12% of peak) of the 2948 us iteration. dia_matvec (resident)
cannot run there — x no longer fits VMEM. This probe races the new
double-buffered dia_matvec_stream at several block sizes.

Usage: python scripts/stream_probe.py [sizes...] > /tmp/stream.json
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops.dia_spmv import dia_matvec_stream  # noqa: E402
from cgx.solver.operators import banded_matvec  # noqa: E402


def make_loop(mv):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, y):
            return mv(y) * 1e-6  # keep finite across iterations

        return jax.lax.fori_loop(0, k, body, x)

    return loop


def main():
    peak = chip_hbm_gbps() * 1e9
    sizes = [int(float(s)) for s in (sys.argv[1:] or ["1e6", "4e6", "1e7"])]
    blocks = [65536, 131072, 262144]
    out = {}
    for n_target in sizes:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]
        ideal_bytes = (ndiag + 2) * n * 4  # bands + x read + y write
        rs = np.random.default_rng(0)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        row = {"n": n}

        def measure(tag, loop):
            last = None
            for _try in range(3):  # relay compile hiccups are transient
                try:
                    r = slope_seconds_per_iter(
                        loop, make_b, ks=(50, 100, 150), reps=3
                    )
                    break
                except Exception as e:
                    last = e
            else:
                row[f"{tag}_err"] = repr(last)[:120]
                return
            row[f"{tag}_us"] = r["s_per_iter"] * 1e6
            row[f"{tag}_pct"] = ideal_bytes / r["s_per_iter"] / peak * 100
            row[f"{tag}_fit"] = r["fit_rel_err"]

        measure("flat", make_loop(lambda v: banded_matvec(bands, offsets, v)))
        for blk in blocks:
            measure(
                f"stream{blk}",
                make_loop(
                    lambda v, _b=blk: dia_matvec_stream(
                        bands, v, offsets=offsets, block=_b
                    )
                ),
            )

        out[str(n)] = row
        print(
            f"# n={n}: flat {row.get('flat_us', float('nan')):.0f}us "
            f"({row.get('flat_pct', float('nan')):.0f}%)"
            + "".join(
                f" | s{b//1024}k {row.get(f'stream{b}_us', float('nan')):.0f}us"
                f" ({row.get(f'stream{b}_pct', float('nan')):.0f}%)"
                for b in blocks
            ),
            file=sys.stderr,
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
