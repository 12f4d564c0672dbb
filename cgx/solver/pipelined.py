"""Communication-reduced (Chronopoulos-Gear) CG, optionally
preconditioned.

The reference pays two latency-bound scalar all-reduces per iteration
at *different* points of the recurrence (conj cg.cc:106, rsnew
cg.cc:117), so their latencies cannot overlap. The Chronopoulos-Gear
reordering computes every per-iteration scalar from the same vectors at
the same point, so ONE fused all-reduce of a small vector replaces them
— halving (or better) the per-iteration latency term alpha*log2(p) of
the cost model quoted on the reference's MPI-hard slide (Thakur et
al.). This is the classic "communication-reduced CG" of the literature
the report points toward (e.g. arXiv:1905.06850, arXiv:2501.03743 —
PAPERS.md).

Recurrence (u = M^-1 r; plain CG is M = I, u == r):

    r0 = b - A x0 ; u0 = M^-1 r0 ; w0 = A u0
    loop k = 0, 1, ...:
        gamma = <r, u> ; delta = <w, u> [; rr = <r, r>]  # ONE reduction
        if sqrt(rr) < tol: break        # rr == gamma when M == I
        beta  = 0 if k == 0 else gamma / gamma_old
        alpha = gamma / (delta - beta * gamma / alpha_old)   # k>0
              = gamma / delta                                # k==0
        p = u + beta p ; s = w + beta s      # s == A p by induction
        x = x + alpha p ; r = r - alpha s
        u = M^-1 r ; w = A u
        gamma_old, alpha_old = gamma, alpha

Identical exact arithmetic to classic (P)CG (same Krylov iterates); in
floating point the trajectories drift at the rounding level. The
convergence test uses the *current* <r,r> — checked before the update,
like the reference checks after; iteration counts match classic CG to
within one.
"""

from __future__ import annotations

from functools import partial as _partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops.reduce import vdot
from cgx.solver.cg import CGResult, _as_matvec


def pipelined_cg_loop(
    operator_tree: Any,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: jnp.ndarray,
    nearzero: jnp.ndarray,
    *,
    maxiter: int,
    history: int,
    dot_precision,
    matvec,
    precond=None,  # callable (tree, r) -> M^-1 r, or None
    dots=None,  # fused reduction: [(a,b), ...] -> tuple of scalars
):
    if dots is None:

        def dots(pairs):
            return tuple(vdot(a, b_, precision=dot_precision) for a, b_ in pairs)

    acc = b.dtype if dot_precision is None else jnp.dtype(dot_precision)

    def mv(v):
        return matvec(operator_tree, v)

    def pc(v):
        return v if precond is None else precond(operator_tree, v)

    has_pc = precond is not None
    r = b - mv(x0)
    u0 = pc(r)
    w = mv(u0)
    zero = jnp.zeros((), acc)
    hist0 = jnp.full((max(history, 1),), jnp.nan, dtype=acc)
    (rr0,) = dots([(r, r)])
    # zero initial residual would NaN alpha inside the loop (see cg.py)
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)

    # without a preconditioner u == r: keep it out of the carry so the
    # plain path does not pay a redundant N-vector per iteration
    def unpack(state):
        if has_pc:
            return state
        (k, x, r, p, s, w, g_old, a_old, converged, hist, breakdown) = state
        return (k, x, r, r, p, s, w, g_old, a_old, converged, hist, breakdown)

    def pack(k, x, r, u, p, s, w, g_old, a_old, converged, hist, breakdown):
        if has_pc:
            return (k, x, r, u, p, s, w, g_old, a_old, converged, hist, breakdown)
        return (k, x, r, p, s, w, g_old, a_old, converged, hist, breakdown)

    def cond(state):
        k = state[0]
        converged = state[-3]
        return jnp.logical_and(k < maxiter, jnp.logical_not(converged))

    def body(state):
        (k, x, r, u, p, s, w, g_old, a_old, converged, hist, breakdown) = (
            unpack(state)
        )
        if precond is None:
            gamma, delta = dots([(r, u), (w, u)])
            rr = gamma
        else:
            gamma, delta, rr = dots([(r, u), (w, u), (r, r)])
        res = jnp.sqrt(rr)
        if history > 0:
            hist = hist.at[k].set(res, mode="drop")
        converged = res < tol
        first = k == 0
        beta = jnp.where(first, zero, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        # alpha guard in the spirit of the reference clamp (cg.cc:107);
        # gated on not-converged: the degenerate denom computed on the
        # converged iteration must not flag breakdown on a healthy solve
        breakdown = jnp.logical_or(
            breakdown, jnp.logical_and(jnp.logical_not(converged), denom <= 0)
        )
        alpha = (gamma / jnp.maximum(denom, gamma * nearzero)).astype(b.dtype)
        beta_v = beta.astype(b.dtype)
        p_new = u + beta_v * p
        s_new = w + beta_v * s
        x_new = x + alpha * p_new
        r_new = r - alpha * s_new
        u_new = pc(r_new)
        w_new = mv(u_new)
        # freeze on convergence (reference break semantics)
        upd = jnp.logical_not(converged)

        def sel(new, old):
            return jnp.where(upd, new, old)

        return pack(
            jnp.where(upd, k + 1, k),
            sel(x_new, x),
            sel(r_new, r),
            sel(u_new, u),
            sel(p_new, p),
            sel(s_new, s),
            sel(w_new, w),
            jnp.where(upd, gamma, g_old),
            jnp.where(upd, alpha.astype(acc), a_old),
            converged,
            hist,
            breakdown,
        )

    state0 = pack(
        jnp.asarray(0, jnp.int32),
        x0,
        r,
        u0,
        jnp.zeros_like(r),
        jnp.zeros_like(r),
        w,
        rr0,  # g_old: a real <r,r> so a pre-converged exit reports a
        # meaningful rsold (a ones() placeholder would print 1.0)
        jnp.ones((), acc),
        pre_conv,
        hist0,
        jnp.asarray(False),
    )
    (k, x, r, u, p, s, w, g_old, a_old, converged, hist, breakdown) = (
        unpack(jax.lax.while_loop(cond, body, state0))
    )
    # final <r,r> through the SAME reduction as the loop (under
    # shard_map a plain local vdot would report a per-shard partial)
    (rr,) = dots([(r, r)])
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        converged=converged,
        rsold=g_old,
        history=hist if history > 0 else hist[:0],
        breakdown=breakdown,
    )


_pipelined_jit = _partial(
    jax.jit,
    static_argnames=("maxiter", "history", "dot_precision", "matvec", "precond"),
)(pipelined_cg_loop)


def pipelined_cg_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    dot_precision=None,
    precond=None,
) -> CGResult:
    """Single-device entry point for the Chronopoulos-Gear CG.

    ``precond`` is an optional ``r -> M^-1 r`` apply (e.g. from
    cgx.solver.precond); with it, the three per-iteration scalars still
    ride one fused reduction."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        from cgx.solver.operators import DenseOperator

        a = DenseOperator(a)
    mv = _as_matvec(a)
    if hasattr(a, "matvec"):
        tree = a
        static_mv = _call
    else:
        tree = None
        static_mv = _Closure(mv)
    from cgx.solver.cg import _ClosurePrecond

    static_pc = None if precond is None else _ClosurePrecond(precond)
    return _pipelined_jit(
        tree,
        b,
        x0,
        jnp.asarray(tol, b.dtype if dot_precision is None else dot_precision),
        jnp.asarray(nearzero, b.dtype),
        maxiter=int(maxiter),
        history=int(history),
        dot_precision=dot_precision,
        matvec=static_mv,
        precond=static_pc,
    )


def _call(tree, x):
    return tree.matvec(x)


class _Closure:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, tree, x):
        return self.fn(x)

    def __hash__(self):
        return hash(self.fn)

    def __eq__(self, other):
        return isinstance(other, _Closure) and self.fn == other.fn
