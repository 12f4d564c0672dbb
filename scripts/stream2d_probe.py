"""Measure the 2-D-layout streaming DIA mat-vec above the VMEM cliff.

Context (scripts/cliff_probe.py, scripts/blocked_probe.py):
- End-to-end banded fp32 CG: 73% of HBM peak at N=1e6, 28-30% at
  N=4e6..1e7; at 1e7 the mat-vec alone is 2926 us of the 2948 us
  iteration — the cliff IS the mat-vec.
- Mat-vec-only loops at N>=4e6 report impossible >100% rates: XLA
  keeps bands+x VMEM-resident (96 MB at 4e6), which a real CG
  iteration (4 more vectors, dots) cannot do. Only end-to-end CG
  numbers are meaningful there.
- 1-D Pallas stream kernel: 16-26% (VPU-bound by the (1, n) layout).
- lax.map-blocked XLA variant: 10-11% (no DMA/compute overlap).

This probe measures dia_matvec_stream2d (full-vreg 2-D layout) at
matvec level AND end-to-end CG with a stream2d-backed operator vs the
flat-operator CG, at N in {4e6, 1e7}.

Usage: python scripts/stream2d_probe.py [sizes...] > out.json
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

from cgx.bench.slope import (  # noqa: E402
    chip_hbm_gbps,
    dia_cg_bytes_per_iter,
    slope_seconds_per_iter,
)
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops.dia_spmv import dia_matvec_stream2d  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402


def make_mv_loop(mv):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        def body(i, y):
            return mv(y) * 1e-6

        return jax.lax.fori_loop(0, k, body, x)

    return loop


@jax.tree_util.register_pytree_node_class
class StreamDiaOperator(DiaOperator):
    """DiaOperator whose matvec routes to the 2-D streaming kernel."""

    def matvec(self, x):
        return dia_matvec_stream2d(
            self.bands, x, offsets=self.offsets, rows=256, cols=512
        )


def main():
    peak = chip_hbm_gbps() * 1e9
    sizes = [int(float(s)) for s in (sys.argv[1:] or ["4e6", "1e7"])]
    out = {}
    for n_target in sizes:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        bands = jnp.asarray(np.asarray(dia.bands, np.float32))
        offsets = tuple(dia.offsets)
        ndiag = bands.shape[0]
        mv_bytes = (ndiag + 2) * n * 4
        cg_bytes = dia_cg_bytes_per_iter(n, ndiag, 4)
        rs = np.random.default_rng(0)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        row = {"n": n}

        def measure(tag, loop, ideal_bytes, ks):
            last = None
            for _try in range(3):
                try:
                    r = slope_seconds_per_iter(loop, make_b, ks=ks, reps=3)
                    break
                except Exception as e:
                    last = e
            else:
                row[f"{tag}_err"] = repr(last)[:160]
                print(f"#   {tag}: ERR", file=sys.stderr, flush=True)
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
        # mat-vec level (cache-resident caveat does NOT apply to the
        # stream kernels: x rides HBM by construction)
        for (r2, c2) in ((128, 512), (256, 512), (256, 1024)):
            measure(
                f"s2d_{r2}x{c2}",
                make_mv_loop(
                    lambda v, _r=r2, _c=c2: dia_matvec_stream2d(
                        bands, v, offsets=offsets, rows=_r, cols=_c
                    )
                ),
                mv_bytes,
                ks=(50, 100, 150),
            )

        # end-to-end CG, flat vs stream2d operator
        flat_op = DiaOperator(bands, offsets)
        s2d_op = StreamDiaOperator(bands, offsets)

        def cg_loop(op):
            def run(b, k):
                return cg_solve(op, b, tol=0.0, maxiter=k).x

            return run

        measure("cg_flat", cg_loop(flat_op), cg_bytes, ks=(25, 50, 75))
        measure("cg_s2d", cg_loop(s2d_op), cg_bytes, ks=(25, 50, 75))
        out[str(n)] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
