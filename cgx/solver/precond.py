"""Preconditioners (BASELINE.json config 4 extension; absent in the
reference, whose only guard is the alpha clamp cg.cc:107).

Preconditioned CG uses the same recurrence as :mod:`cgx.solver.cg`
with z = M^{-1} r replacing r in the direction updates; with M = I it
reduces to the exact reference sequence of operations.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def jacobi(diag: jnp.ndarray, eps: float = 0.0) -> Callable:
    """Jacobi (diagonal) preconditioner: z = r / diag(A).

    For the reference's constant-diagonal Laplacians this is a uniform
    scaling (no convergence change) — it matters for variable-
    coefficient or scaled problems."""
    inv = 1.0 / jnp.where(jnp.abs(diag) > eps, diag, jnp.ones_like(diag))

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        return inv * r

    return apply


def chebyshev_banded(
    bands: jnp.ndarray,
    offsets,
    lmin: float,
    lmax: float,
    degree: int = 4,
):
    """Degree-``degree`` Chebyshev polynomial preconditioner.

    Runs ``degree`` Chebyshev-iteration steps on ``A z = r`` from
    ``z0 = 0`` using spectral bounds — the minimax-optimal degree-d
    polynomial approximation to A^-1 on [lmin, lmax] *when the bounds
    are tight*. SPD by construction (the residual polynomial is bounded
    below 1 in magnitude on the spectrum), hence CG-safe. Pure banded
    mat-vecs: fully data-parallel, no reductions inside the apply.

    Bounds from :func:`cgx.solver.chebyshev.spectral_bounds` or exact
    eigen-bounds when known; the iteration reduction is quite
    sensitive to the lower bound (use the Lanczos estimate, not a
    floor). Economics: NO polynomial preconditioner can cut CG's
    *total mat-vec count* (poly-PCG's Krylov space after k iterations
    is a constrained subset of plain CG's after k*(degree+1)); what it
    buys is (degree+1) mat-vecs of progress per reduction pair — wall
    time when scalar/reduction work dominates (fp64-emulated TPU
    dots), latency on large meshes. bench.py races it against Neumann
    and plain CG per run.
    """
    from cgx.solver.operators import banded_matvec

    offsets = tuple(offsets)
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        # z0 = 0, r0 = r
        z = jnp.zeros_like(r)
        res = r
        p = res / theta
        rho_old = 1.0 / sigma1
        for _ in range(degree):
            z = z + p
            res = res - banded_matvec(bands, offsets, p)
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            p = (rho * rho_old) * p + (2.0 * rho / delta) * res
            rho_old = rho
        return z

    return apply


def chebyshev_poly(matvec, lmin: float, lmax: float, degree: int = 3):
    """Operator-agnostic Chebyshev polynomial preconditioner.

    Same recurrence as :func:`chebyshev_banded` but over any
    ``x -> A x`` callable (dense, ELL, CSR, closures over shard_map
    collectives, ...). The apply costs ``degree`` mat-vecs and no
    reductions.

    Caveat (measured): the polynomial FOLDS the spectrum — the
    preconditioned eigenvalues land in [1 - 1/T_d(s1), 1 + 1/T_d(s1)]
    (verified exact on lap2d_reference(400): kappa 322 -> 72 at
    degree 3) but EQUIOSCILLATE across that interval, so the
    eigenvalue clustering plain CG exploits is destroyed. At low
    degree on Laplacian-like spectra the CG count may NOT drop
    (108 -> 123 on that matrix) while each iteration pays ``degree``
    extra mat-vecs; the polynomial only pays off once
    1/T_d(s1) << 1 — i.e. degree >~ sqrt(kappa)/2, where it behaves
    like an inner Chebyshev solve (cf. the degree-40 coarsest-level
    solve in cgx.solver.multigrid)."""
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        z = jnp.zeros_like(r)
        res = r
        p = res / theta
        rho_old = 1.0 / sigma1
        for _ in range(degree):
            z = z + p
            res = res - matvec(p)
            rho = 1.0 / (2.0 * sigma1 - rho_old)
            p = (rho * rho_old) * p + (2.0 * rho / delta) * res
            rho_old = rho
        return z

    return apply


def neumann_banded(bands: jnp.ndarray, offsets, omega: float = 1.0, sweeps: int = 1):
    """Truncated-Neumann polynomial preconditioner for banded matrices:
    ``z = sum_{k<sweeps} (I - omega D^{-1} A)^k (omega D^{-1} r)``.

    TPU-native alternative to SSOR/IC: no triangular solves (those
    serialize poorly on a vector machine) — only banded mat-vecs, i.e.
    pure VPU streaming. Symmetric for symmetric A; positive definite
    for diagonally dominant SPD stencils with omega <= 1 (the
    polynomial sum_{k<m} (1-omega*lambda)^k stays positive on the
    scaled spectrum (0, 2)). ``sweeps=1`` is scaled Jacobi.
    """
    from cgx.solver.operators import banded_matvec

    offsets = tuple(offsets)
    d_idx = offsets.index(0)
    inv_d = omega / bands[d_idx]

    def apply(r: jnp.ndarray) -> jnp.ndarray:
        c = inv_d * r
        z = c
        for _ in range(sweeps - 1):
            # z <- c + (I - omega D^-1 A) z
            z = c + z - inv_d * banded_matvec(bands, offsets, z)
        return z

    return apply
