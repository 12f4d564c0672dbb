"""Fused s-step envelope gate (round-4 VERDICT item 1).

Full-solve convergence check of dia_sstep_stream_solve at large N with
the double-f32 cross-block Gram accumulation, against the plain stream
kernel's solve on the SAME (op, b, tol) — the gate is iteration-count
agreement within a band plus a true residual at the shared fp32 floor,
exactly the methodology of results/hw_queue_r3/sstep_envelope3.log.

Reference anchor: the mat-vec is the reference's entire cost model
(/root/reference/code/MPI/cg.cc:100-102); the fused block exists to cut
its HBM traffic 3.3x at s=4.

Usage: python scripts/sstep_envelope.py [g ...] > out.json
Env: SSTEP_SVALS=2,4,6  TOL_REL=1e-5
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
from cgx.ops.sstep_stream import dia_sstep_stream_solve  # noqa: E402


def true_rel(op, x, b):
    """fp64 host-side ||Ax-b||/||b|| via the banded oracle."""
    import scipy.sparse as sp

    n = b.shape[0]
    bands = np.asarray(op.bands, np.float64)
    diags = []
    for k, off in enumerate(op.offsets):
        if off >= 0:
            diags.append(bands[k, : n - off])
        else:
            diags.append(bands[k, -off:n])
    A = sp.diags(diags, list(op.offsets), shape=(n, n))
    x = np.asarray(x, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(A @ x - b) / np.linalg.norm(b))


def main():
    gs = [int(a) for a in sys.argv[1:]] or [2000, 3200]
    svals = tuple(
        int(v) for v in os.environ.get("SSTEP_SVALS", "2,4,6").split(",")
    )
    tol_rel = float(os.environ.get("TOL_REL", "1e-5"))
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}", file=sys.stderr, flush=True)
    out = {"device": dev, "tol_rel": tol_rel, "rows": {}}
    for g in gs:
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        rng = np.random.default_rng(0)
        b = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        nb = float(np.linalg.norm(np.asarray(b, np.float64)))
        tol = tol_rel * nb
        maxiter = 30000

        res0 = dia_cg_solve_stream(op, b, tol=tol, maxiter=maxiter)
        jax.block_until_ready(res0.x)
        row0 = {
            "iters": int(res0.iterations),
            "converged": bool(res0.converged),
            "true_rel": true_rel(op, res0.x, b),
        }
        print(f"# g={g} stream: {row0}", file=sys.stderr, flush=True)
        rows = {"stream": row0}
        for s in svals:
            try:
                res = dia_sstep_stream_solve(
                    op, b, s=s, tol=tol, maxiter=maxiter
                )
                jax.block_until_ready(res.x)
                row = {
                    "iters": int(res.iterations),
                    "converged": bool(res.converged),
                    "breakdown": bool(getattr(res, "breakdown", False)),
                    "true_rel": true_rel(op, res.x, b),
                }
            except Exception as e:  # noqa: BLE001
                row = {"error": repr(e)[:200]}
            print(f"# g={g} s={s}: {row}", file=sys.stderr, flush=True)
            rows[f"s{s}"] = row
        out["rows"][str(g)] = rows
    print(json.dumps(out))


if __name__ == "__main__":
    main()
