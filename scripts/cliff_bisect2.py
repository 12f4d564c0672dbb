"""vmem2d <-> stream routing-cliff bisect, bracket-disciplined
(round-4 VERDICT item 8; closes round-2 item 7).

The r3 attempt (results/hw_queue_r3/cliff_bisect.json) was
tenancy-poisoned (a 113%-of-peak row, 8-12x-over-peak controls). This
re-run applies the method that made the s-step races readable: at each
N the STREAM kernel is measured immediately before and after the
candidates, so drift is visible in-band; rows whose surrounding
brackets disagree by more than the gate are flagged distrusted.

Candidates per N: the whole-solve VMEM kernel (vmem2d — skipped once
its scoped footprint exceeds the budget), the XLA-fused while loop,
and the aliased streaming kernel (the bracket itself).

Usage: python scripts/cliff_bisect2.py [n ...] > out.json
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
from cgx.config import VMEM_BUDGET_BYTES  # noqa: E402
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_kernel import dia_cg_solve_vmem, vmem2d_scoped_bytes  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402

BRACKET_GATE = 0.15  # brackets must agree to 15% for a trusted row


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [
        1_000_000, 1_500_000, 2_000_000, 2_500_000, 3_000_000, 4_000_000,
    ]
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
        stream_words = ndiag + 10

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        def measure(fn, ks=(64, 128, 256)):
            return slope_seconds_per_iter(fn, make_b, ks=ks, reps=3)

        def run_stream(b, k):
            return dia_cg_solve_stream(op, b, tol=0.0, maxiter=k).x

        def run_xla(b, k):
            return cg_solve(op, b, tol=0.0, maxiter=k, history=0).x

        def run_vmem(b, k):
            return dia_cg_solve_vmem(op, b, tol=0.0, maxiter=k).x

        row = {"n": n}
        pre = measure(run_stream)
        row["bracket_pre_us"] = pre["s_per_iter"] * 1e6

        scoped = vmem2d_scoped_bytes(ndiag, n, 4, 4)
        row["vmem2d_scoped_mb"] = round(scoped / 2**20, 1)
        if scoped <= VMEM_BUDGET_BYTES:
            try:
                m = measure(run_vmem)
                row["vmem2d_us"] = m["s_per_iter"] * 1e6
                row["vmem2d_spread"] = m["ts_spread"]
            except Exception as e:  # noqa: BLE001
                row["vmem2d_err"] = repr(e)[:160]
        else:
            row["vmem2d_us"] = None

        m = measure(run_xla)
        row["xla_us"] = m["s_per_iter"] * 1e6
        row["xla_spread"] = m["ts_spread"]

        post = measure(run_stream)
        row["bracket_post_us"] = post["s_per_iter"] * 1e6
        row["stream_us"] = (row["bracket_pre_us"]
                            + row["bracket_post_us"]) / 2
        row["stream_pct_peak"] = (
            100 * stream_words * n * 4 / (row["stream_us"] / 1e6) / peak
        )
        drift = abs(row["bracket_pre_us"] - row["bracket_post_us"]) / min(
            row["bracket_pre_us"], row["bracket_post_us"]
        )
        row["bracket_drift"] = drift
        row["trusted"] = drift < BRACKET_GATE
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
