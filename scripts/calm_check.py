"""Quick calm-window check: 3 slope measurements of the plain stream
control at N=4e6; exit 0 iff at least ``need`` of them land with
ts_spread <= gate AND pct_peak inside the sane window. Used by the
hardware queue to avoid launching a long probe into a full tenancy
burst (the probes still gate per-row; this just saves their bounded
retry budget — 1-of-3 calm is enough of a signal for that).

Usage: python scripts/calm_check.py [spread_gate] [pct_lo] [pct_hi] [need]
"""

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
    gate = float(sys.argv[1]) if len(sys.argv) > 1 else 0.2
    lo = float(sys.argv[2]) if len(sys.argv) > 2 else 50.0
    hi = float(sys.argv[3]) if len(sys.argv) > 3 else 105.0
    need = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    g = 2000
    n = g * g
    op = lap2d_operator(g, jnp.float32)
    rng = np.random.default_rng(11)

    def make_b(rep):
        return (1.0 + 0.01 * rep) * rng.standard_normal(n).astype(np.float32)

    def run(b, k):
        return dia_cg_solve_stream(op, b, tol=0.0, maxiter=k,
                                   bands_dtype="auto").x

    # bands_dtype='auto' -> bf16 planes on lap2d: ndiag*2 bytes + 10
    # f32 words (the 15-f32-word model overcounts bands 2x)
    bytes_per_elem = op.bands.shape[0] * 2 + 10 * 4
    peak = chip_hbm_gbps()
    n_calm = 0
    for i in range(3):
        # seconds-scale ks: relay-floor-scale runs are hypersensitive
        # to tenancy (spreads 0.3-27 where these reproduce to 0.2%)
        m = slope_seconds_per_iter(run, make_b, ks=(2000, 4000, 8000),
                                   reps=2)
        gbps = bytes_per_elem * n / m["s_per_iter"] / 1e9
        pct = 100 * gbps / peak
        calm = m["ts_spread"] <= gate and lo <= pct <= hi
        print(f"# calm_check {i}: us/iter {m['s_per_iter'] * 1e6:.1f} "
              f"pct {pct:.1f} spread {m['ts_spread']:.3f} calm={calm}",
              flush=True)
        n_calm += calm
        if n_calm >= need:
            break
    sys.exit(0 if n_calm >= need else 1)


if __name__ == "__main__":
    main()
