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
