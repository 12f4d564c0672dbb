"""Quality gate for the fused s-step block on the reference source-term
RHS (round-4: closes the open gate from results/hw_queue_r4/
sstep_race_a1.json).

The reference source term b[i] = -2 i pi^2 sin^2(10 pi i h)
(MPI/cg.cc:218-234) reaches ~2e8 at N=1.024e7; before the power-of-2
RHS prescale the s-step replay's Gram-entry products overflowed f32 and
s=4 broke instantly at block 1 (race attempt 1: 3 iterations,
true_rel 33.5). This probe re-runs ONLY the gate: a full solve per arm
(stream bracket + fused s=4) to an fp32-reachable tolerance, reporting
iterations / converged / true relative residual. Pass criterion is
QUALITY MATCH between arms (both sit at the same f32 kappa*eps floor at
these condition numbers), not an absolute threshold no f32 solver can
certify at N~1e7 (that job belongs to precision='tw').

Usage: python scripts/sstep_gate_probe.py [n ...] > out.json
"""

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

from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.chebyshev import spectral_bounds  # noqa: E402
from cgx.solver.sstep import sstep_cg_solve  # noqa: E402


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_240_000]
    svals = tuple(int(v) for v in os.environ.get(
        "SSTEP_SVALS", "4").split(","))
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}", file=sys.stderr, flush=True)
    out = {"device": dev, "rows": []}
    for n_target in ns:
        g = int(np.sqrt(n_target))
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        bounds = spectral_bounds(op, n)
        b = source_term_device(n, jnp.float32)
        b_norm = float(jnp.linalg.norm(b.astype(jnp.float64)))
        arms = [("stream", lambda: dia_cg_solve_stream(
            op, b, tol=1e-5 * b_norm, maxiter=60000))]
        for s in svals:
            # the PUBLIC fused route: on basis rank collapse (smooth
            # RHS at huge kappa) the replay freezes and fallback='auto'
            # finishes on the plain streaming kernel
            arms.append((f"sstep_fused_s{s}", lambda _s=s: (
                sstep_cg_solve(
                    op, b, s=_s, tol=1e-5 * b_norm, maxiter=60000,
                    bounds=bounds, powers="fused"))))
            # r4 VERDICT item 8: the adaptive s-ladder — restart at
            # s//2 instead of the stream fallback; 'Done' = the gate
            # converging WITHOUT the stream restart (breakdown stays
            # False on the final rung and quality matches the stream)
            arms.append((f"sstep_fused_s{s}_adaptive", lambda _s=s: (
                sstep_cg_solve(
                    op, b, s=_s, tol=1e-5 * b_norm, maxiter=60000,
                    bounds=bounds, powers="fused",
                    fallback="adaptive"))))
        gate = {}
        import time as _time

        for name, fn in arms:
            t0 = _time.perf_counter()
            res = fn()
            jax.block_until_ready(res.x)
            wall = _time.perf_counter() - t0
            r = b - op.matvec(res.x)
            gate[name] = {
                "iterations": int(res.iterations),
                "converged": bool(res.converged),
                "breakdown": bool(res.breakdown),
                "true_rel": float(
                    jnp.linalg.norm(r.astype(jnp.float64)) / b_norm
                ),
                "wall_s": round(wall, 3),
            }
            print(json.dumps({"n": n, name: gate[name]}),
                  file=sys.stderr, flush=True)
        out["rows"].append({"n": n, "gate": gate})
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
