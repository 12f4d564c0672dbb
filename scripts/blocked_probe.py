"""Race banded mat-vec variants above the VMEM cliff.

Contenders at N in {1e6, 4e6, 1e7} fp32 (lap2d_fd stencils):
- flat:    banded_matvec (shifted-AXPY, XLA-fused) — champion at 1e6,
           collapses to 12% of peak at 1e7 (scripts/cliff_probe.py).
- blkXXX:  banded_matvec_blocked (lax.map over halo'd row blocks).
- s64k:    dia_matvec_stream (Pallas, HBM x + double-buffered DMA)
           — measured 16% at 1e7 (VPU-bound by the (1, n) layout).

Usage: python scripts/blocked_probe.py [sizes...] > /tmp/blocked.json
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
    dia_matvec_stream,
    dia_matvec_stream2d,
)
from cgx.solver.operators import (  # noqa: E402
    banded_matvec,
    banded_matvec_blocked,
)


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
    out = {}
    for n_target in sizes:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]
        ideal_bytes = (ndiag + 2) * n * 4
        rs = np.random.default_rng(0)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        row = {"n": n}

        def measure(tag, loop):
            last = None
            for _try in range(3):
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
            print(
                f"#   {tag}: {row[f'{tag}_us']:.0f}us"
                f" ({row[f'{tag}_pct']:.0f}%) fit {row[f'{tag}_fit']:.3f}",
                file=sys.stderr,
                flush=True,
            )

        print(f"# n={n}", file=sys.stderr, flush=True)
        measure("flat", make_loop(lambda v: banded_matvec(bands, offsets, v)))
        for blk in (65536, 262144, 1048576):
            if blk * 4 >= n:
                continue
            measure(
                f"blk{blk // 1024}k",
                make_loop(
                    lambda v, _b=blk: banded_matvec_blocked(
                        bands, offsets, v, block=_b
                    )
                ),
            )
        measure(
            "s64k",
            make_loop(
                lambda v: dia_matvec_stream(
                    bands, v, offsets=offsets, block=65536
                )
            ),
        )
        for (r2, c2) in ((128, 512), (256, 512), (256, 1024)):
            if r2 * c2 * 4 >= n:
                continue
            measure(
                f"s2d_{r2}x{c2}",
                make_loop(
                    lambda v, _r=r2, _c=c2: dia_matvec_stream2d(
                        bands, v, offsets=offsets, rows=_r, cols=_c
                    )
                ),
            )
        out[str(n)] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
