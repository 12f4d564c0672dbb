"""Differentiable CG solves (implicit function theorem).

A capability the reference's C++/CUDA design cannot express and a
JAX-native framework gets almost for free: gradients of ``x = A^{-1} b``
with respect to both b and the matrix entries, WITHOUT differentiating
through the iteration. For SPD A:

    dL/db = A^{-1} g            (one more CG solve with the same A)
    dL/dA = -(A^{-1} g) x^T     (outer product, projected onto the
                                 operator's sparsity structure)

so the backward pass costs exactly one CG solve plus one structured
outer product — independent of the forward iteration count, with no
stored iterates (contrast differentiating through the loop, which
would checkpoint every iteration).

Supported operators: Dense, DIA, ELLPACK, CSR (gradient w.r.t. the
stored values, respecting sparsity — a zero entry stays zero).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.solver.cg import cg_solve
from cgx.solver.operators import (
    CsrOperator,
    DenseOperator,
    DiaOperator,
    EllOperator,
)


def _matvec_cotangent(op, y: jnp.ndarray, x: jnp.ndarray):
    """Cotangent of the operator for dL/dA = y x^T, projected onto the
    operator's structure. Returns an operator-shaped pytree."""
    if isinstance(op, DenseOperator):
        return DenseOperator(jnp.outer(y, x))
    if isinstance(op, DiaOperator):
        n = op.bands.shape[1]
        pad = max(max(abs(o) for o in op.offsets), 1)
        xp = jnp.pad(x, (pad, pad))
        rows = []
        for off in op.offsets:
            shifted = jax.lax.dynamic_slice(xp, (pad + off,), (n,))
            rows.append(y * shifted)
        return DiaOperator(jnp.stack(rows), op.offsets)
    if isinstance(op, EllOperator):
        gathered = jnp.take(x, op.indices, axis=0)  # (n, K)
        return EllOperator(y[:, None] * gathered, jnp.zeros_like(op.indices))
    if isinstance(op, CsrOperator):
        vals = jnp.take(y, op.row_ids) * jnp.take(x, op.indices)
        return CsrOperator(
            vals, jnp.zeros_like(op.indices), jnp.zeros_like(op.row_ids), op.n
        )
    raise TypeError(f"no cotangent rule for {type(op)}")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cg_solve_differentiable(
    op,
    b: jnp.ndarray,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: int | None = None,
    nearzero: float = NEARZERO,
) -> jnp.ndarray:
    """x = A^{-1} b as a differentiable function of (op, b).

    Returns only x (use :func:`cgx.solver.cg.cg_solve` when you need the
    full :class:`CGResult`)."""
    return cg_solve(op, b, tol=tol, maxiter=maxiter, nearzero=nearzero).x


def _fwd(op, b, tol, maxiter, nearzero):
    x = cg_solve(op, b, tol=tol, maxiter=maxiter, nearzero=nearzero).x
    return x, (op, x)


def _bwd(tol, maxiter, nearzero, residuals, g):
    import numpy as np
    from jax import dtypes

    op, x = residuals
    # A symmetric: solve A y = g for the b-gradient.
    y = cg_solve(op, g, tol=tol, maxiter=maxiter, nearzero=nearzero).x
    cot = _matvec_cotangent(op, y, x)

    def neg_or_zero(v):
        # integer leaves (index arrays) take float0 cotangents
        if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
            return np.zeros(v.shape, dtypes.float0)
        return -v

    neg = jax.tree_util.tree_map(neg_or_zero, cot)
    return (neg, y)


cg_solve_differentiable.defvjp(_fwd, _bwd)


def _matvec_cotangent_block(op, y: jnp.ndarray, x: jnp.ndarray):
    """Blockwise dL/dA = Y X^T projected onto the operator structure
    (Y, X are (n, s))."""
    if isinstance(op, DenseOperator):
        return DenseOperator(y @ x.T)
    if isinstance(op, DiaOperator):
        n = op.bands.shape[1]
        pad = max(max(abs(o) for o in op.offsets), 1)
        xp = jnp.pad(x, ((pad, pad), (0, 0)))
        rows = []
        for off in op.offsets:
            shifted = jax.lax.dynamic_slice(
                xp, (pad + off, 0), (n, x.shape[1])
            )
            rows.append(jnp.einsum("ns,ns->n", y, shifted))
        return DiaOperator(jnp.stack(rows), op.offsets)
    raise TypeError(f"no block cotangent rule for {type(op)}")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def block_cg_solve_differentiable(
    op,
    b_block: jnp.ndarray,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: int | None = None,
) -> jnp.ndarray:
    """X = A^{-1} B (all columns in one breakdown-free block-CG Krylov
    space) as a differentiable function of (op, B): the backward pass
    is ONE more block solve with the same A plus a structured Y X^T —
    independent of the forward iteration count, no stored iterates.
    Dense and DIA operators."""
    from cgx.solver.blockcg import block_cg_solve

    return block_cg_solve(op, b_block, tol=tol, maxiter=maxiter).x


def _fwd_block(op, b_block, tol, maxiter):
    from cgx.solver.blockcg import block_cg_solve

    x = block_cg_solve(op, b_block, tol=tol, maxiter=maxiter).x
    return x, (op, x)


def _bwd_block(tol, maxiter, residuals, g):
    import numpy as np
    from jax import dtypes

    from cgx.solver.blockcg import block_cg_solve

    op, x = residuals
    y = block_cg_solve(op, g, tol=tol, maxiter=maxiter).x
    cot = _matvec_cotangent_block(op, y, x)

    def neg_or_zero(v):
        if jnp.issubdtype(v.dtype, jnp.integer) or v.dtype == jnp.bool_:
            return np.zeros(v.shape, dtypes.float0)
        return -v

    return (jax.tree_util.tree_map(neg_or_zero, cot), y)


block_cg_solve_differentiable.defvjp(_fwd_block, _bwd_block)
