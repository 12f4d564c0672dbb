"""Batched multi-RHS CG (BASELINE.json config 5).

``vmap`` over the while-loop solver gives per-RHS convergence masking
for free: JAX's batching rule for ``lax.while_loop`` keeps iterating
until every batch member's predicate is false while freezing finished
members — the semantics the reference would have needed a hand-written
mask for. On TPU the batched mat-vec turns the bandwidth-bound mat-vec
into a compute-denser mat-mat (the MXU finally earns its keep: one
sweep of A serves every RHS).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.solver.cg import CGResult, cg_solve


def cg_solve_batched(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    dot_precision=None,
) -> CGResult:
    """Solve ``A X = B`` for multiple right-hand sides.

    Args:
      b: (batch, n) right-hand sides.
    Returns a :class:`CGResult` whose fields carry a leading batch axis.
    """
    if b.ndim != 2:
        raise ValueError("b must be (batch, n) for the batched solver")
    if maxiter is None:
        maxiter = b.shape[1]

    solver = partial(
        cg_solve,
        a,
        tol=tol,
        maxiter=maxiter,
        nearzero=nearzero,
        history=history,
        dot_precision=dot_precision,
    )
    if x0 is None:
        return jax.vmap(lambda bi: solver(bi))(b)
    return jax.vmap(lambda bi, xi: solver(bi, xi))(b, x0)
