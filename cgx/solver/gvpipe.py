"""Communication-HIDING (Ghysels-Vanroose) pipelined CG.

The Chronopoulos-Gear recurrence (cgx.solver.pipelined) fuses the
reference's two scalar all-reduces (cg.cc:106, 117) into ONE launch,
but that launch is still on the critical path: the next mat-vec input
``u = M^-1 r`` needs ``alpha``, which needs the reduction result, so
every iteration pays max-rank latency alpha*log2(p) (the latency term
of the cost model on the reference's MPI-hard slide, Thakur et al.)
*in series* with the mat-vec.

Ghysels & Vanroose (Parallel Computing 40, 2014; PAPERS.md) restructure
the recurrence so the mat-vec input is available BEFORE the reduction
result is consumed: the product ``n = A (M^-1 w)`` depends only on the
carried ``w``, never on this iteration's scalars. The reduction and the
mat-vec therefore have no data dependence inside one iteration, and
XLA's async collectives (TPU all-reduce launches are asynchronous by
default) overlap the psum with the mat-vec + preconditioner compute —
hiding the latency term entirely whenever the local mat-vec takes
longer than alpha*log2(p). ``tests/test_collective_counts.py`` pins
both facts: one fused psum per iteration AND the absence of a
psum -> mat-vec-communication dependency path in the loop body
(contrast: 'pipelined' has that path).

Recurrence (u = M^-1 r; plain CG is M = I so u == r, m == w, q == s):

    r0 = b - A x0 ; u0 = M^-1 r0 ; w0 = A u0
    loop k = 0, 1, ...:
        gamma = <r, u> ; delta = <w, u> [; rr = <r, r>]  # ONE reduction
        m = M^-1 w ; n = A m        # independent of the reduction:
                                    # overlaps its latency
        if sqrt(rr) < tol: break    # rr == gamma when M == I
        beta  = 0 if k == 0 else gamma / gamma_old
        alpha = gamma / (delta - beta * gamma / alpha_old)   # k>0
              = gamma / delta                                # k==0
        z = n + beta z   # z == A M^-1 s   by induction
        q = m + beta q   # q == M^-1 s
        s = w + beta s   # s == A p
        p = u + beta p
        x = x + alpha p ; r = r - alpha s
        u = u - alpha q ; w = w - alpha z
        gamma_old, alpha_old = gamma, alpha

Exact arithmetic identical to classic (P)CG; in floating point the
deeper recurrences (w, u, s, z, q are all updated recursively, never
recomputed) drift faster than classic CG's — the known cost of
pipelining (Cools, Yetkin, Agullo, Giraud, Vanroose, SIAM J. Matrix
Anal. 2018). ``replace_every`` installs their cure: every k
iterations a lax.cond-gated replacement recomputes r, u, w, s, q, z
from their definitions (three extra mat-vecs on that iteration only),
pinning the recursive residual to the true one, guarded by the same
noise-floor test the s-step solver uses (sstep.py:149-155 — a
replacement fired once ||r|| is at the explicit-residual error floor
injects out-of-Krylov noise that detonates the alpha clamp; measured
here: unguarded cadence-10 diverges to inf at the 1e-9 floor where
guarded cadence-10 converges). Default cadence 25 restores classic
CG's attainable accuracy (measured: the reference's absolute tol
1e-10 on lap2d N=1024 fp64 is unreachable without it — the plain GV
recursion floors at ~3e-8); ``replace_every=0`` switches it off.
"""

from __future__ import annotations

from functools import partial as _partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops.reduce import vdot
from cgx.solver.cg import CGResult, _as_matvec


def gv_cg_loop(
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
    replace_every: int = 25,  # residual-replacement cadence (0 = off)
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
    if has_pc:
        rr0, g0, bb0 = dots([(r, r), (r, u0), (b, b)])
    else:
        rr0, bb0 = dots([(r, r), (b, b)])
        g0 = rr0
    # replacement floor (same lesson as sstep.py:149-155): the EXPLICIT
    # residual b - Ax carries an O(eps*(||b|| + ||A x||)) error floor,
    # so a replacement fired below it injects out-of-Krylov noise that
    # detonates the alpha clamp. Guard on the carried gamma (== <r,r>
    # unpreconditioned; the M-norm of r otherwise). The b-energy ratio
    # matters for WARM starts: ||r0|| << ||b|| there, and a floor keyed
    # to r0 alone sits far below the b-scale noise in b - Ax (measured:
    # an x0 at 1e-8 relative error drives the unscaled guard to admit
    # replacements that diverge the recursion).
    scale = jnp.maximum(jnp.asarray(1.0, acc), bb0 / rr0)
    g_floor = jnp.asarray(jnp.finfo(b.dtype).eps, acc) * g0 * scale
    # zero initial residual would NaN alpha inside the loop (see cg.py)
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)

    # without a preconditioner u == r, q == s, m == w: keep the aliases
    # out of the carry so the plain path pays no redundant N-vectors
    def unpack(state):
        if has_pc:
            return state
        (k, x, r, w, p, s, z, g_old, a_old, converged, hist, breakdown) = state
        return (
            k, x, r, r, w, p, s, s, z, g_old, a_old, converged, hist,
            breakdown,
        )

    def pack(
        k, x, r, u, w, p, s, q, z, g_old, a_old, converged, hist, breakdown
    ):
        if has_pc:
            return (
                k, x, r, u, w, p, s, q, z, g_old, a_old, converged, hist,
                breakdown,
            )
        return (k, x, r, w, p, s, z, g_old, a_old, converged, hist, breakdown)

    def cond(state):
        k = state[0]
        converged = state[-3]
        breakdown = state[-1]
        # breakdown EXITS (unlike cg.py/pipelined.py, which carry the
        # clamped alpha onward): a drifted GV recurrence stagnating at
        # its accuracy floor eventually drives denom <= 0, and the
        # clamped 1/nearzero step then detonates to inf within three
        # iterations (measured). Freezing at the last finite state
        # returns an honest converged=False, breakdown=True result.
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_not(jnp.logical_or(converged, breakdown)),
        )

    def replace(x, p):
        """Recompute the recursive vectors from their definitions
        (r = b - Ax, u = M^-1 r, w = A u, s = A p, q = M^-1 s,
        z = A q): three mat-vecs, on the cadence iteration only."""
        r_t = b - mv(x)
        u_t = pc(r_t)
        w_t = mv(u_t)
        s_t = mv(p)
        q_t = pc(s_t)
        z_t = mv(q_t)
        return r_t, u_t, w_t, s_t, q_t, z_t

    def body(state):
        (k, x, r, u, w, p, s, q, z, g_old, a_old, converged, hist, breakdown) = (
            unpack(state)
        )
        if replace_every > 0:
            do_rep = jnp.logical_and(
                jnp.logical_and(k > 0, k % replace_every == 0),
                g_old > g_floor,
            )
            r, u, w, s, q, z = jax.lax.cond(
                do_rep,
                lambda _: replace(x, p),
                lambda _: (r, u, w, s, q, z),
                operand=None,
            )
        if precond is None:
            gamma, delta = dots([(r, u), (w, u)])
            rr = gamma
        else:
            gamma, delta, rr = dots([(r, u), (w, u), (r, r)])
        # the mat-vec input is the CARRIED w — no dependence on this
        # iteration's reduction; XLA overlaps the psum with these two
        m = pc(w)
        n_vec = mv(m)
        res = jnp.sqrt(rr)
        if history > 0:
            hist = hist.at[k].set(res, mode="drop")
        converged = res < tol
        first = k == 0
        beta = jnp.where(first, zero, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        # alpha guard in the spirit of the reference clamp (cg.cc:107);
        # gated on not-converged like pipelined.py
        breakdown = jnp.logical_or(
            breakdown, jnp.logical_and(jnp.logical_not(converged), denom <= 0)
        )
        alpha = (gamma / jnp.maximum(denom, gamma * nearzero)).astype(b.dtype)
        beta_v = beta.astype(b.dtype)
        z_new = n_vec + beta_v * z
        q_new = m + beta_v * q
        s_new = w + beta_v * s
        p_new = u + beta_v * p
        x_new = x + alpha * p_new
        r_new = r - alpha * s_new
        u_new = u - alpha * q_new
        w_new = w - alpha * z_new
        # freeze on convergence (reference break semantics) AND on
        # breakdown (keep the pre-detonation state; cond() exits next)
        upd = jnp.logical_not(jnp.logical_or(converged, breakdown))

        def sel(new, old):
            return jnp.where(upd, new, old)

        return pack(
            jnp.where(upd, k + 1, k),
            sel(x_new, x),
            sel(r_new, r),
            sel(u_new, u),
            sel(w_new, w),
            sel(p_new, p),
            sel(s_new, s),
            sel(q_new, q),
            sel(z_new, z),
            jnp.where(upd, gamma, g_old),
            jnp.where(upd, alpha.astype(acc), a_old),
            converged,
            hist,
            breakdown,
        )

    zeros = jnp.zeros_like(r)
    state0 = pack(
        jnp.asarray(0, jnp.int32),
        x0,
        r,
        u0,
        w,
        zeros,  # p
        zeros,  # s
        zeros,  # q
        zeros,  # z
        rr0,  # g_old: meaningful rsold on a pre-converged exit
        jnp.ones((), acc),
        pre_conv,
        hist0,
        jnp.asarray(False),
    )
    (k, x, r, u, w, p, s, q, z, g_old, a_old, converged, hist, breakdown) = (
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


_gv_jit = _partial(
    jax.jit,
    static_argnames=(
        "maxiter", "history", "dot_precision", "matvec", "precond",
        "replace_every",
    ),
)(gv_cg_loop)


def gv_cg_solve(
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
    replace_every: int = 25,
) -> CGResult:
    """Single-device entry point for Ghysels-Vanroose pipelined CG.

    ``precond`` is an optional ``r -> M^-1 r`` apply; the three
    per-iteration scalars still ride one fused reduction, and the
    mat-vec never waits on it. ``replace_every`` is the guarded
    residual-replacement cadence (0 = off; see module docstring)."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        from cgx.solver.operators import DenseOperator

        a = DenseOperator(a)
    mv = _as_matvec(a)
    from cgx.solver.pipelined import _Closure, _call

    if hasattr(a, "matvec"):
        tree = a
        static_mv = _call
    else:
        tree = None
        static_mv = _Closure(mv)
    from cgx.solver.cg import _ClosurePrecond

    static_pc = None if precond is None else _ClosurePrecond(precond)
    return _gv_jit(
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
        replace_every=int(replace_every),
    )
