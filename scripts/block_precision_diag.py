"""Attribute the block-CG stagnation at g=1000 (round-5 econ probe):
machinery precision vs method.

The round-5 hardware econ rows show the f32 breakdown-free block arm
STAGNANT (worst-column true rel ~ 11 after 2500 iters at g=1000,
s=8) while s independent f32 cg_solve runs of the same columns descend
normally — impossible in exact arithmetic (the block space contains
every single-column space), so something numerical breaks above the
g=400 regime where the r4 re-adjudication verified identical
trajectories (commit b28be91).

This runs the SAME family at one iteration cap on CPU in f32 and f64:
  - f64 block converges, f32 block stagnates  -> f32 machinery limit
    (rank-reveal/Gram dynamics at kappa ~ 4e5), not the method;
  - f64 block ALSO stagnates                  -> method/family issue.
Also races rank_tol to test the rank-reveal-drops-active-directions
hypothesis.

CPU-only (deterministic, idle-rig-independent):
  python scripts/block_precision_diag.py [g] [s] [k] > out.json
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.solver.blockcg import block_cg_solve  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402

from block_econ_probe import _family, _true_rels  # noqa: E402


def run_arm(g, s, k, dtype, rank_tol=1e-12):
    op = lap2d_operator(g, dtype)
    n = g * g
    b = source_term_device(n, dtype)
    bs = _family(b, s) if s > 1 else b[:, None]
    res = block_cg_solve(op, bs, tol=0.0, maxiter=k, rank_tol=rank_tol)
    rels = _true_rels(op, np.asarray(res.x), np.asarray(bs))
    seq = []
    for j in range(s):
        rj = cg_solve(op, bs[:, j], tol=0.0, maxiter=k)
        seq.append(_true_rels(
            op, np.asarray(rj.x)[:, None], np.asarray(bs[:, j])[:, None])[0])
    return {
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                     else dtype),
        "rank_tol": rank_tol,
        "block_max_rel": float(max(rels)),
        "block_rels": [float(v) for v in rels],
        "seq_max_rel": float(max(seq)),
        "seq_rels": [float(v) for v in seq],
    }


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 2500
    out = {"g": g, "s": s, "k": k, "arms": []}
    for dtype, rts in ((jnp.float32, (1e-12, 1e-6, 1e-4)),
                      (jnp.float64, (1e-12,))):
        for rt in rts:
            arm = run_arm(g, s, k, dtype, rank_tol=rt)
            out["arms"].append(arm)
            print(f"# {arm['dtype']} rank_tol={rt}: block "
                  f"{arm['block_max_rel']:.3e} vs seq "
                  f"{arm['seq_max_rel']:.3e}", file=sys.stderr, flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
