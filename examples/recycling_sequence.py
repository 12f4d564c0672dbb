"""Spectral recycling across a solve sequence (cgx.solve_sequence).

Production solvers face sequences A x_t = b_t (time stepping, outer
optimisation loops). This demo builds a high-contrast
variable-coefficient Poisson problem (two low-conductivity inclusions
— the structure that sinks plain CG), then:

  1. solves the first system with plain CG, harvesting a deflation
     basis from its own iterates at zero extra cost
     (cgx.cg_solve_harvest — the CG residuals ARE the Lanczos vectors);
  2. solves every later system with deflated PCG (harvested basis +
     Jacobi composed).

Expected output (CPU, fp64):

    t=0 (harvesting, plain CG):   ~520 iterations
    t>0 (deflated + jacobi):       ~67 iterations each

Run:  JAX_PLATFORMS=cpu python examples/recycling_sequence.py
Add --devices 8 for the row-sharded path (same API, same numbers).
"""

import argparse

import numpy as np

import jax

jax.config.update("jax_enable_x64", True)

import cgx  # noqa: E402
from cgx.mats.generators import poisson2d_var  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    g = 24
    n = g * g
    c = np.ones((g, g))
    c[4:10, 4:10] = 1e-4
    c[14:20, 14:20] = 1e-4
    dia = poisson2d_var(g, c)
    a = np.asarray(dia.to_dense())

    rng = np.random.default_rng(0)
    bs = [rng.standard_normal(n) for _ in range(args.steps)]
    cfg = cgx.SolveConfig(tolerance=1e-8, maxiter=5 * n, precond="jacobi")
    results = cgx.solve_sequence(
        dia, bs, cfg, k=16, window=256, n_devices=args.devices
    )
    for t, (res, b) in enumerate(zip(results, bs)):
        rel = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
        kind = "harvesting, plain CG" if t == 0 else "deflated + jacobi"
        print(
            f"t={t} ({kind}): {int(res.iterations)} iterations, "
            f"true ||Ax-b||/||b|| = {rel:.2e}, "
            f"converged={bool(res.converged)}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
