"""Hardware correctness check for the ALIASED stacked stream layout
(round-4: ROADMAP "aliasing for the stacked stream layout").

Interpret-mode tests cannot see in-place DMA races (sequential
execution — memory fact, axon-tpu-hardware-facts); this drives full
solves on the chip and compares layout='stacked' against the proven
aliased split layout: iteration counts must match exactly (identical
math, identical rounding) and the true residual must agree. g=2000 is
the size that exposed the split kernel's ordering hazard
(results/hw_queue_r3/stream_alias_race.log).

Usage: python scripts/stacked_alias_check.py [g ...] > out.json
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

from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402


def main():
    gs = [int(a) for a in sys.argv[1:]] or [2000, 3200]
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}", file=sys.stderr, flush=True)
    out = {"device": dev, "rows": []}
    rng = np.random.default_rng(7)
    for g in gs:
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        bn = float(jnp.linalg.norm(b))
        tol = 1e-4 * bn
        row = {"g": g, "n": n}
        for layout in ("split", "stacked"):
            res = dia_cg_solve_stream(
                op, b, tol=tol, maxiter=20000, layout=layout
            )
            r = b - op.matvec(res.x)
            row[layout] = {
                "iterations": int(res.iterations),
                "converged": bool(res.converged),
                "true_rel": float(jnp.linalg.norm(r)) / bn,
            }
            print(json.dumps({"g": g, layout: row[layout]}),
                  file=sys.stderr, flush=True)
        row["iters_match"] = (
            row["split"]["iterations"] == row["stacked"]["iterations"]
        )
        out["rows"].append(row)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
