"""Same-session race: shared-roll plane_matvec vs the per-offset
flat_shift form it replaced, on the streaming CG kernel (split + PCG;
the patched symbol is cg_stream's module global, so the stream2d /
dia_powers call sites are NOT covered by this race).

The session-9 verdict (BENCHMARKS.md) convicted in-kernel VPU compute
— dominated by the 2-roll+select lane shifts of the band applications
— for the gap between the fused kernel's ~420-440 GB/s and the 651
GB/s manual-DMA machinery ceiling. plane_matvec rolls the FULL slab
once per distinct ``off % cols`` and row-windows the result (lane
rolls are row-local, so the two windows of flat_shift's 2-roll form
are windows of one roll): 8 rolls/mat-vec -> 4 for a 5-band stencil.
This script measures whether Mosaic actually schedules that as less
critical-path work, same-session and interleaved so relay tenancy
swings hit both arms.

Usage: python scripts/shift_race.py [n ...] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

import cgx.ops.cg_stream as cs  # noqa: E402
from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops._util import flat_shift  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402


def plane_matvec_unshared(bands_load, v, offsets, base_rows, rows, cols):
    """The pre-session-10 form: flat_shift (2 rolls + select) per
    offset, no roll sharing. Kept here only as the race control."""

    def load(r0, nr):
        return v[r0 : r0 + nr, :]

    acc = bands_load(0) * flat_shift(
        load, base_rows, offsets[0], rows, cols
    )
    for d, off in enumerate(offsets[1:], start=1):
        acc += bands_load(d) * flat_shift(
            load, base_rows, off, rows, cols
        )
    return acc


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, peak {peak/1e9} GB/s", file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    shared = cs.plane_matvec
    for n_target in ns:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        op = DiaOperator.from_host(dia, dtype=np.float32)
        ndiag = len(dia.offsets)

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        for variant, impl in (("shared", shared),
                              ("unshared", plane_matvec_unshared),
                              ("shared2", shared)):
            cs.plane_matvec = impl
            jax.clear_caches()
            for tag, words, runner in (
                ("stream", ndiag + 10, cs.dia_cg_solve_stream),
                ("stream_pcg", ndiag + 12, cs.dia_cg_solve_stream_pcg),
            ):
                def run(b, k, _r=runner, _op=op):
                    return _r(_op, b, tol=0.0, maxiter=k).x

                m = slope_seconds_per_iter(run, make_b, ks=(32, 64, 128),
                                           reps=3)
                gbps = words * n * 4 / m["s_per_iter"] / 1e9
                row = {
                    "n": n, "variant": variant, "tag": tag,
                    "us_per_iter": m["s_per_iter"] * 1e6,
                    "gbps": gbps, "pct_peak": 100 * gbps * 1e9 / peak,
                    "ts_spread": m["ts_spread"],
                    "fit_rel_err": m["fit_rel_err"],
                }
                out["rows"].append(row)
                print(json.dumps(row), file=sys.stderr, flush=True)
        cs.plane_matvec = shared
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
