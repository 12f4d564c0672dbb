"""Fused Pallas fast path for banded CG (fp32/bf16).

Per iteration this runs exactly three streaming kernels
(cgx.ops.dia_spmv / cgx.ops.axpy):

    1. (Ap, conj)      <- dia_matvec_dot(bands, p)   [5N+2N traffic]
    2. (x', r', rsnew) <- fused_update_rs(...)       [4N read, 2N write]
    3. p'              <- fused_axpby(beta, p, 1, r) [2N read, 1N write]

versus the reference's seven separate passes + two D2H scalar copies
per iteration (CUDA path: fill, MatVec, 2x cublasDdot with
cudaMemcpy, 3x sumVec — cg.cu:236-266). All scalars stay on device in
the while_loop carry.

This is the mixed-precision mode of BASELINE.json config 4: storage
and kernels in fp32 (or bf16), the convergence scalar compared in the
kernel dtype; pair it with fp64 refinement via
:func:`cgx.solver.refine.iterative_refinement` when the reference's
absolute 1e-10 tolerance is required.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops.axpy import fused_axpby, fused_update_rs
from cgx.ops.dia_spmv import dia_matvec_dot
from cgx.solver.cg import CGResult
from cgx.solver.operators import DiaOperator


@partial(
    jax.jit,
    static_argnames=("offsets", "maxiter", "history", "block", "interpret"),
)
def _dia_cg_pallas(
    bands,
    b,
    x0,
    tol,
    nearzero,
    *,
    offsets,
    maxiter: int,
    history: int,
    block: int,
    interpret: bool,
):
    dtype = b.dtype
    # pad the bands ONCE, above the while loop: the per-iteration
    # re-pad costs 2*ndiag*N extra words (XLA will not hoist it)
    n_p = -(-b.shape[0] // block) * block
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - bands.shape[1])))

    def mv_dot(p):
        return dia_matvec_dot(
            bands_p, p, offsets=offsets, block=block, interpret=interpret
        )

    ap0, _ = mv_dot(x0)
    r = b - ap0
    p = r
    rsold = jnp.sum(r * r)
    # zero initial residual would NaN alpha inside the loop (see cg.py)
    pre_conv = jnp.logical_or(jnp.sqrt(rsold) < tol, rsold == 0)
    hist0 = jnp.full((max(history, 1),), jnp.nan, dtype=dtype)

    def cond(state):
        k, x, r, p, rsold, rsnew, converged, hist, breakdown = state
        return jnp.logical_and(k < maxiter, jnp.logical_not(converged))

    def body(state):
        k, x, r, p, rsold, _, _, hist, breakdown = state
        ap, conj = mv_dot(p)
        breakdown = jnp.logical_or(breakdown, conj <= 0)
        alpha = rsold / jnp.maximum(conj, rsold * nearzero)
        x, r, rsnew = fused_update_rs(
            x, p, r, ap, alpha, block=block, interpret=interpret
        )
        res = jnp.sqrt(rsnew)
        if history > 0:
            hist = hist.at[k].set(res, mode="drop")
        converged = res < tol
        beta = rsnew / rsold
        p_next = fused_axpby(p, r, beta, jnp.ones((), dtype), block=block,
                             interpret=interpret)
        p = jnp.where(converged, p, p_next)
        rsold_next = jnp.where(converged, rsold, rsnew)
        k_next = jnp.where(converged, k, k + 1)
        return (k_next, x, r, p, rsold_next, rsnew, converged, hist, breakdown)

    state0 = (
        jnp.asarray(0, jnp.int32),
        x0,
        r,
        p,
        rsold,
        rsold,
        pre_conv,
        hist0,
        jnp.asarray(False),
    )
    k, x, r, p, rsold, rsnew, converged, hist, breakdown = jax.lax.while_loop(
        cond, body, state0
    )
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rsnew),
        converged=converged,
        rsold=rsold,
        history=hist if history > 0 else hist[:0],
        breakdown=breakdown,
    )


def dia_cg_solve_pallas(
    op: DiaOperator,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    block: int = 2048,
    interpret: bool = False,
) -> CGResult:
    """CG on a banded operator with the fused Pallas kernel loop."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _dia_cg_pallas(
        op.bands,
        b,
        x0,
        jnp.asarray(tol, b.dtype),
        jnp.asarray(nearzero, b.dtype),
        offsets=tuple(op.offsets),
        maxiter=int(maxiter),
        history=int(history),
        block=int(block),
        interpret=bool(interpret),
    )
