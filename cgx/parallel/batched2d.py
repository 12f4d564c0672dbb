"""Batched multi-RHS CG over a 2-D device mesh (rows x rhs).

The data-parallel axis the reference never had: a 2-D
``Mesh(('rows', 'rhs'))`` shards the matrix rows across one axis (the
reference's domain decomposition) and the right-hand sides across the
other (pure data parallelism — zero communication between rhs groups).
Per iteration the communication is exactly the 1-D row decomposition's
(halo exchange + per-rhs psum over 'rows'); the 'rhs' axis only joins
for the tiny convergence vote.

Each right-hand side converges independently (per-column freeze masks,
the same semantics vmap gives the single-device batched solver), and
the loop runs until every column on every shard is done.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.utils.collectives import run_recorded
from cgx.mats.containers import DIAMatrix
from cgx.parallel.partition import pad_bands, padded_size
from cgx.parallel.sharded_cg import _DiaHalo

ROWS, RHS = "rows", "rhs"


class _Dia2DAllGather:
    """Fallback matvec when the stencil bandwidth exceeds the row-shard
    size: all-gather p over the row axis, then window locally (the same
    fallback the 1-D path takes automatically)."""

    def __init__(self, offsets, n_loc: int):
        self.offsets = tuple(offsets)
        self.n_loc = n_loc

    def __call__(self, bands_loc, p_loc):
        import jax
        import jax.numpy as jnp

        p_full = jax.lax.all_gather(p_loc, ROWS, tiled=True)
        start = jax.lax.axis_index(ROWS) * self.n_loc
        pad = max(max(abs(o) for o in self.offsets), 1)
        p_pad = jnp.pad(p_full, ((pad, pad), (0, 0)))
        y = jnp.zeros_like(p_loc)
        for d, off in enumerate(self.offsets):
            sl = jax.lax.dynamic_slice_in_dim(
                p_pad, pad + start + off, self.n_loc, axis=0
            )
            y = y + bands_loc[d][:, None] * sl
        return y

    def __hash__(self):
        return hash((type(self), self.offsets, self.n_loc))

    def __eq__(self, other):
        return type(other) is type(self) and (
            other.offsets, other.n_loc
        ) == (self.offsets, self.n_loc)


class _TreeMv2D:
    """Adapter: strategy mat-vec over the (bands, inv_diag) tree."""

    def __init__(self, base):
        self.base = base

    def __call__(self, op, X):
        return self.base(op[0], X)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


class _Jacobi2D:
    """Per-column Jacobi apply: Z = D^-1 R, purely local."""

    def __call__(self, op, R):
        return op[1][:, None] * R

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


class _Neumann2D:
    """Per-column degree-1 Neumann apply (cf. _TreeNeumannPrecond):
    Z = 2 D^-1 R - D^-1 A (D^-1 R); costs one strategy mat-vec."""

    def __init__(self, base_mv):
        self.base = base_mv

    def __call__(self, op, R):
        bands_loc, inv_diag_loc = op
        c = inv_diag_loc[:, None] * R
        return 2.0 * c - inv_diag_loc[:, None] * self.base(bands_loc, c)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


def make_mesh2d(
    n_row_groups: int, n_rhs_groups: int, devices=None
) -> Mesh:
    """(rows x rhs) mesh over the first n_row_groups*n_rhs_groups devices."""
    if devices is None:
        devices = jax.devices()
    need = n_row_groups * n_rhs_groups
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_row_groups, n_rhs_groups)
    return Mesh(grid, (ROWS, RHS))


def _coldot(a, b):
    # per-rhs <a, b>: local column sums + psum over the row axis
    return jax.lax.psum(jnp.sum(a * b, axis=0), ROWS)


def _coldots(pairs):
    # FUSED per-rhs reductions: all local column sums ride ONE psum of
    # a (len(pairs), nrhs_loc) plane (the batched _PsumDots analogue)
    stacked = jnp.stack([jnp.sum(a * b, axis=0) for a, b in pairs])
    out = jax.lax.psum(stacked, ROWS)
    return tuple(out[i] for i in range(len(pairs)))


def _live_vote(conv, k, maxiter):
    # a column is live while unconverged AND under its budget —
    # counting only ~conv would spin forever once a column stalls
    # out at maxiter
    live = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
    return jax.lax.psum(jnp.sum(live.astype(jnp.int32)), RHS) > 0


def _loop(op, B_loc, tol, nearzero, *, mv, pc, maxiter: int):
    """Per-shard batched (P)CG body (inside shard_map), reference
    recurrence with per-column freeze masks. With a preconditioner the
    two post-update reductions (<R,R> convergence + <R,Z> direction)
    ride one fused psum, so comm per iteration stays at 2 collectives
    either way."""
    dtype = B_loc.dtype

    X = jnp.zeros_like(B_loc)
    R = B_loc  # x0 = 0
    if pc is None:
        Z = R
        rsold = _coldot(R, R)
        rr0 = rsold
    else:
        Z = pc(op, R)
        rsold, rr0 = _coldots([(R, Z), (R, R)])
    Pv = Z
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    k0 = jnp.zeros(B_loc.shape[1], jnp.int32)
    brk0 = jnp.zeros(B_loc.shape[1], bool)

    def cond(state):
        k, X, R, Pv, rsold, rr, conv, brk = state
        return _live_vote(conv, k, maxiter)

    def body(state):
        k, X, R, Pv, rsold, _, conv, brk = state
        active = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
        AP = mv(op, Pv)
        conj = _coldot(Pv, AP)
        # surface non-SPD breakdown per column (parity with every other
        # solver path) instead of silently clamping
        brk = jnp.logical_or(brk, jnp.logical_and(active, conj <= 0))
        alpha = rsold / jnp.maximum(conj, rsold * nearzero)
        alpha = jnp.where(active, alpha, 0.0).astype(dtype)  # freeze done cols
        X = X + alpha[None, :] * Pv
        R = R - alpha[None, :] * AP
        if pc is None:
            rr = _coldot(R, R)
            rsnew = rr
            Znew = R
        else:
            Znew = pc(op, R)
            rsnew, rr = _coldots([(R, Znew), (R, R)])
        conv_now = jnp.sqrt(rr) < tol
        adv = jnp.logical_and(active, jnp.logical_not(conv_now))
        beta = jnp.where(adv, rsnew / rsold, 0.0).astype(dtype)
        P_next = Znew + beta[None, :] * Pv
        Pv = jnp.where(adv[None, :], P_next, Pv)
        rsold = jnp.where(adv, rsnew, rsold)
        k = jnp.where(adv, k + 1, k)
        conv = jnp.logical_or(conv, jnp.logical_and(active, conv_now))
        return (k, X, R, Pv, rsold, rr, conv, brk)

    k, X, R, Pv, rsold, rr, conv, brk = jax.lax.while_loop(
        cond, body, (k0, X, R, Pv, rsold, rr0, pre_conv, brk0)
    )
    return X, k, jnp.sqrt(rr), conv, brk


def _pipelined_loop(op, B_loc, tol, nearzero, *, mv, pc, maxiter: int):
    """Per-shard batched Chronopoulos-Gear body: ONE fused psum per
    iteration for ALL per-column scalars (2 planes plain, 3 with a
    preconditioner) — cf. cgx.solver.pipelined for the recurrence."""
    dtype = B_loc.dtype
    nrhs = B_loc.shape[1]

    X = jnp.zeros_like(B_loc)
    R = B_loc  # x0 = 0
    U = R if pc is None else pc(op, R)
    W = mv(op, U)
    (rr0,) = _coldots([(R, R)])
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    k0 = jnp.zeros(nrhs, jnp.int32)
    brk0 = jnp.zeros(nrhs, bool)

    def cond(state):
        k, conv = state[0], state[-2]
        return _live_vote(conv, k, maxiter)

    def body(state):
        k, X, R, U, Pv, S, W, g_old, a_old, conv, brk = state
        if pc is None:
            gamma, delta = _coldots([(R, U), (W, U)])
            rr = gamma
        else:
            gamma, delta, rr = _coldots([(R, U), (W, U), (R, R)])
        conv_now = jnp.sqrt(rr) < tol
        active = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
        adv = jnp.logical_and(active, jnp.logical_not(conv_now))
        first = k == 0
        beta = jnp.where(first, 0.0, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        brk = jnp.logical_or(brk, jnp.logical_and(adv, denom <= 0))
        alpha = gamma / jnp.maximum(denom, gamma * nearzero)
        alpha_m = jnp.where(adv, alpha, 0.0).astype(dtype)
        beta_v = beta.astype(dtype)
        sel = adv[None, :]
        Pv = jnp.where(sel, U + beta_v[None, :] * Pv, Pv)
        S = jnp.where(sel, W + beta_v[None, :] * S, S)
        X = X + alpha_m[None, :] * Pv
        R_new = R - alpha_m[None, :] * S
        U_new = R_new if pc is None else pc(op, R_new)
        W_new = mv(op, U_new)
        R = jnp.where(sel, R_new, R)
        U = jnp.where(sel, U_new, U)
        W = jnp.where(sel, W_new, W)
        g_old = jnp.where(adv, gamma, g_old)
        a_old = jnp.where(adv, alpha, a_old)
        k = jnp.where(adv, k + 1, k)
        conv = jnp.logical_or(conv, jnp.logical_and(active, conv_now))
        return (k, X, R, U, Pv, S, W, g_old, a_old, conv, brk)

    state0 = (
        k0, X, R, U, jnp.zeros_like(R), jnp.zeros_like(R), W,
        rr0, jnp.ones(nrhs, dtype), pre_conv, brk0,
    )
    (k, X, R, U, Pv, S, W, g_old, a_old, conv, brk) = jax.lax.while_loop(
        cond, body, state0
    )
    (rr_fin,) = _coldots([(R, R)])
    return X, k, jnp.sqrt(rr_fin), conv, brk


def _gv_loop(
    op, B_loc, tol, nearzero, *, mv, pc, maxiter: int,
    replace_every: int = 25,
):
    """Per-shard batched Ghysels-Vanroose body: ONE fused psum plane
    per iteration AND the mat-vec input depends only on the carry, so
    the psum overlaps the mat-vec (cgx.solver.gvpipe semantics,
    batched over columns: per-column freeze masks, guarded residual
    replacement fired when any live column hits its cadence, and
    per-column breakdown freezing — a broken column stops voting)."""
    dtype = B_loc.dtype
    nrhs = B_loc.shape[1]
    has_pc = pc is not None

    X = jnp.zeros_like(B_loc)
    R = B_loc  # x0 = 0
    U = R if pc is None else pc(op, R)
    W = mv(op, U)
    if has_pc:
        rr0, g0 = _coldots([(R, R), (R, U)])
    else:
        (rr0,) = _coldots([(R, R)])
        g0 = rr0
    # replacement floor: this loop always starts from X = 0 (warm
    # starts reach it PRE-SHIFTED via the api shift identity), so
    # <r0,r0> == <b,b> and the g0-keyed floor is already the
    # b-energy-scaled one that gvpipe.py needs to compute explicitly
    g_floor = jnp.asarray(jnp.finfo(dtype).eps, rr0.dtype) * g0
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    k0 = jnp.zeros(nrhs, jnp.int32)
    brk0 = jnp.zeros(nrhs, bool)

    # without a preconditioner U == R and Q == S: keep the aliases out
    # of the carry (same design as gvpipe.py's pack/unpack — two fewer
    # (n_loc, nrhs_loc) planes copied per iteration)
    def unpack(state):
        if has_pc:
            return state
        (k, X, R, W, Pv, S, Z, g_old, a_old, conv, brk) = state
        return (k, X, R, R, W, Pv, S, S, Z, g_old, a_old, conv, brk)

    def pack(k, X, R, U, W, Pv, S, Q, Z, g_old, a_old, conv, brk):
        if has_pc:
            return (k, X, R, U, W, Pv, S, Q, Z, g_old, a_old, conv, brk)
        return (k, X, R, W, Pv, S, Z, g_old, a_old, conv, brk)

    def live_vote(conv, brk, k):
        live = jnp.logical_and(
            jnp.logical_not(jnp.logical_or(conv, brk)), k < maxiter
        )
        return jax.lax.psum(jnp.sum(live.astype(jnp.int32)), RHS) > 0

    def cond(state):
        k, conv, brk = state[0], state[-2], state[-1]
        return live_vote(conv, brk, k)

    def replace(X, Pv):
        R_t = B_loc - mv(op, X)
        U_t = R_t if pc is None else pc(op, R_t)
        W_t = mv(op, U_t)
        S_t = mv(op, Pv)
        Q_t = S_t if pc is None else pc(op, S_t)
        Z_t = mv(op, Q_t)
        return R_t, U_t, W_t, S_t, Q_t, Z_t

    def body(state):
        (k, X, R, U, W, Pv, S, Q, Z, g_old, a_old, conv, brk) = unpack(state)
        active = jnp.logical_and(
            jnp.logical_not(jnp.logical_or(conv, brk)), k < maxiter
        )
        if replace_every > 0:
            col_rep = jnp.logical_and(
                jnp.logical_and(k > 0, k % replace_every == 0),
                jnp.logical_and(g_old > g_floor, active),
            )
            any_rep = (
                jax.lax.psum(jnp.sum(col_rep.astype(jnp.int32)), RHS) > 0
            )

            def do_rep(_):
                R_t, U_t, W_t, S_t, Q_t, Z_t = replace(X, Pv)
                m = col_rep[None, :]
                return (
                    jnp.where(m, R_t, R), jnp.where(m, U_t, U),
                    jnp.where(m, W_t, W), jnp.where(m, S_t, S),
                    jnp.where(m, Q_t, Q), jnp.where(m, Z_t, Z),
                )

            R, U, W, S, Q, Z = jax.lax.cond(
                any_rep, do_rep, lambda _: (R, U, W, S, Q, Z),
                operand=None,
            )
        if pc is None:
            gamma, delta = _coldots([(R, U), (W, U)])
            rr = gamma
        else:
            gamma, delta, rr = _coldots([(R, U), (W, U), (R, R)])
        # mat-vec input is the CARRIED W: no same-iteration psum dep
        M_ = W if pc is None else pc(op, W)
        Nv = mv(op, M_)
        conv_now = jnp.sqrt(rr) < tol
        adv = jnp.logical_and(active, jnp.logical_not(conv_now))
        first = k == 0
        beta = jnp.where(first, 0.0, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        brk_now = jnp.logical_and(adv, denom <= 0)
        brk = jnp.logical_or(brk, brk_now)
        adv = jnp.logical_and(adv, jnp.logical_not(brk_now))
        alpha = gamma / jnp.maximum(denom, gamma * nearzero)
        alpha_m = jnp.where(adv, alpha, 0.0).astype(dtype)
        beta_v = beta.astype(dtype)
        sel = adv[None, :]
        Z_n = jnp.where(sel, Nv + beta_v[None, :] * Z, Z)
        S_n = jnp.where(sel, W + beta_v[None, :] * S, S)
        P_n = jnp.where(sel, U + beta_v[None, :] * Pv, Pv)
        if pc is None:
            Q_n = S_n  # q == s without a preconditioner
        else:
            Q_n = jnp.where(sel, M_ + beta_v[None, :] * Q, Q)
        X = X + alpha_m[None, :] * P_n
        R = jnp.where(sel, R - alpha_m[None, :] * S_n, R)
        U = R if pc is None else jnp.where(
            sel, U - alpha_m[None, :] * Q_n, U
        )
        W = jnp.where(sel, W - alpha_m[None, :] * Z_n, W)
        g_old = jnp.where(adv, gamma, g_old)
        a_old = jnp.where(adv, alpha, a_old)
        k = jnp.where(adv, k + 1, k)
        conv = jnp.logical_or(conv, jnp.logical_and(active, conv_now))
        return pack(
            k, X, R, U, W, P_n, S_n, Q_n, Z_n, g_old, a_old, conv, brk
        )

    Zzero = jnp.zeros_like(R)
    state0 = pack(
        k0, X, R, U, W, Zzero, Zzero, Zzero, Zzero,
        g0, jnp.ones(nrhs, rr0.dtype), pre_conv, brk0,
    )
    (k, X, R, U, W, Pv, S, Q, Z, g_old, a_old, conv, brk) = unpack(
        jax.lax.while_loop(cond, body, state0)
    )
    (rr_fin,) = _coldots([(R, R)])
    return X, k, jnp.sqrt(rr_fin), conv, brk


def sharded_cg_solve_batched(
    mat: DIAMatrix,
    B: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    row_groups: Optional[int] = None,
    rhs_groups: Optional[int] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    method: str = "reference",
    precond: Optional[str] = None,
    gv_replace_every: int = 25,
):
    """Solve ``A X = B`` for many RHS over a (rows x rhs) mesh.

    Args:
      mat: banded host matrix.
      B: (nrhs, n) right-hand sides.
      method: 'reference' (2 psums/iter over 'rows'), 'pipelined'
        (Chronopoulos-Gear: ONE fused psum/iter of all per-column
        scalars), or 'gvpipe' (Ghysels-Vanroose: the one fused psum
        plane overlaps the mat-vec — cgx.solver.gvpipe batched, with
        per-column guarded residual replacement and breakdown
        freezing).
      precond: None | 'jacobi' | 'neumann' — same distributed applies
        as the 1-D sharded solver, batched over columns.
    Returns (X (nrhs, n), iterations (nrhs,), residual_norm (nrhs,),
    converged (nrhs,), breakdown (nrhs,)).
    """
    if mesh is None:
        mesh = make_mesh2d(row_groups or 1, rhs_groups or 1)
    pr = mesh.shape[ROWS]
    pc = mesh.shape[RHS]
    nrhs, n = B.shape
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, pr)
    r_pad = padded_size(nrhs, pc)

    B_np = np.asarray(B)
    # bands must match B's dtype or the while_loop carry types diverge
    bands = pad_bands(np.asarray(mat.bands, dtype=B_np.dtype), n_pad)
    B_pad = np.zeros((n_pad, r_pad), dtype=B_np.dtype)
    B_pad[:n, :nrhs] = B_np.T

    from cgx.parallel.sharded_cg import _put

    bands_dev = _put(bands, mesh, P(None, ROWS))
    B_dev = _put(B_pad, mesh, P(ROWS, RHS))

    n_loc = n_pad // pr
    halo = max(max(abs(o) for o in mat.offsets), 1)
    if halo <= n_loc:
        base_mv = _DiaHalo(ROWS, tuple(mat.offsets), n_loc, pr)
    else:
        # bandwidth exceeds the row shard: same auto-fallback as the
        # 1-D sharded solver
        base_mv = _Dia2DAllGather(mat.offsets, n_loc)

    if precond is None:
        op_dev, op_spec, mv, pc = bands_dev, P(None, ROWS), base_mv, None
    else:
        diag = np.asarray(mat.bands[mat.offsets.index(0)])
        inv_diag = np.zeros(n_pad, dtype=B_np.dtype)
        inv_diag[:n] = 1.0 / diag.astype(B_np.dtype)
        inv_diag_dev = _put(inv_diag, mesh, P(ROWS))
        op_dev = (bands_dev, inv_diag_dev)
        op_spec = (P(None, ROWS), P(ROWS))
        mv = _TreeMv2D(base_mv)
        if precond == "jacobi":
            pc = _Jacobi2D()
        elif precond == "neumann":
            pc = _Neumann2D(base_mv)
        else:
            raise ValueError(f"unknown precond {precond!r}")

    if method == "reference":
        loop = partial(_loop, mv=mv, pc=pc, maxiter=int(maxiter))
    elif method == "pipelined":
        loop = partial(_pipelined_loop, mv=mv, pc=pc, maxiter=int(maxiter))
    elif method == "gvpipe":
        loop = partial(
            _gv_loop, mv=mv, pc=pc, maxiter=int(maxiter),
            replace_every=int(gv_replace_every),
        )
    else:
        raise ValueError(f"unknown method {method!r}")

    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(op_spec, P(ROWS, RHS), P(), P()),
            out_specs=(P(ROWS, RHS), P(RHS), P(RHS), P(RHS), P(RHS)),
            check_vma=False,
        )
    )
    X, k, res, conv, brk = run_recorded(fn, 
        op_dev,
        B_dev,
        jnp.asarray(tol, B_dev.dtype),
        jnp.asarray(nearzero, B_dev.dtype),
    )
    return X.T[:nrhs, :n], k[:nrhs], res[:nrhs], conv[:nrhs], brk[:nrhs]
