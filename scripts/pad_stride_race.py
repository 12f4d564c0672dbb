"""Same-session race: grid-stride padding on the streaming CG kernel.

pad_stride packs each grid row of the domain to a multiple of the
plane width ``cols`` so the ±g band offsets become pure row shifts
(only the ±1 lane rolls remain), at the cost of g'/g extra traffic.
Arms, interleaved per n:

  nopad   — rows=256 cols=512, pad_stride=False (session-9 champion)
  pad512  — rows=256 cols=512, pad_stride=True  (overhead g'/g at 512)
  pad128  — rows=1024 cols=128, pad_stride=True (finer padding quantum)
  nopad2  — nopad again (tenancy drift bracket)

Usage: python scripts/pad_stride_race.py [n ...] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops._util import round_up  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, peak {peak/1e9} GB/s", file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
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

        arms = (
            ("nopad", 256, 512, False),
            ("pad512", 256, 512, True),
            ("pad128", 1024, 128, True),
            ("nopad2", 256, 512, False),
        )
        for name, rows, cols, pad in arms:
            # effective traffic multiplier of the padded layout
            mult = round_up(g, cols) / g if pad else 1.0
            words = (ndiag + 10) * mult

            def run(b, k, _r=rows, _c=cols, _p=pad):
                return dia_cg_solve_stream(
                    op, b, tol=0.0, maxiter=k, rows=_r, cols=_c,
                    pad_stride=_p,
                ).x

            m = slope_seconds_per_iter(run, make_b, ks=(32, 64, 128),
                                       reps=3)
            gbps = words * n * 4 / m["s_per_iter"] / 1e9
            row = {
                "n": n, "arm": name, "pad_mult": mult,
                "us_per_iter": m["s_per_iter"] * 1e6,
                "gbps_incl_pad": gbps,
                "pct_peak": 100 * gbps * 1e9 / peak,
                "ts_spread": m["ts_spread"],
                "fit_rel_err": m["fit_rel_err"],
            }
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
