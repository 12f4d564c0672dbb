"""Deflated CG: recycle spectral information across solve sequences.

Production solvers rarely face ONE system — they face sequences
``A x_t = b_t`` (time stepping, optimisation outer loops, parameter
sweeps) with the same (or slowly-varying) A. CG's cost is dominated by
the smallest eigenvalues; deflation removes them: given a basis W
whose columns approximate the lowest eigenvectors, deflated CG
(Saad, Yeung, Erhel & Guyomarc'h 2000) keeps every search direction
A-orthogonal to range(W), so convergence is governed by
lambda_{k+1}/lambda_max instead of lambda_1/lambda_max.

The basis comes for free: :func:`lanczos_ritz` harvests CONVERGED
Ritz vectors from an m-step Lanczos pass (m mat-vecs, once per
OPERATOR — amortised across the whole solve sequence). Measured on
the N=400 quasi-Laplacian at abs tol 1e-10: 108 plain iterations ->
85 / 62 / 41 with k = 8 / 16 / 32 deflated pairs (the low end of this
spectrum is dense, so gains grow with k; larger spectral gaps give
more per vector).

TPU shape: the per-iteration deflation cost is four tall (n, k)
matmuls and two tiny (k, k) matmuls (the Gram inverse is precomputed
— triangular solves are serial/latency-bound on TPU) fused into the
CG loop; no extra reductions beyond CG's own two.

When it pays: sequences over operators whose LOW SPECTRUM IS SPARSE
(a few isolated small eigenvalues — e.g. nearly-singular systems,
jumping coefficients). On the N=1e4 FD Laplacian the low end is dense
(15 converged pairs out of 256 Lanczos steps barely dent the count:
537 -> 447) and the fp64-emulated tall matmuls cost more than they
save — measured 25x slower than Neumann-PCG there. Profile before
adopting; this is a structure-dependent tool, not a default.

Reference anchor: extends the reference recurrence (cg.cc:96-137)
with the A-orthogonal projector; exact stopping semantics preserved.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops._util import f32_exact as _f32_exact
from cgx.ops.reduce import vdot
from cgx.solver.cg import CGResult


def lanczos_ritz(
    op,
    n: int,
    k: int,
    *,
    m: Optional[int] = None,
    seed: int = 0,
    ritz_tol: float = 1e-3,
) -> np.ndarray:
    """Up to k CONVERGED lowest Ritz vectors of a symmetric operator,
    from an m-step Lanczos pass with full reorthogonalization (host
    orchestration, device mat-vecs). Returns W (n, k'), orthonormal,
    k' <= k.

    Only Ritz pairs whose residual bound ``beta_m |s_{m,i}|`` is below
    ``ritz_tol`` times the spectral width are kept: deflating with
    UNCONVERGED Ritz vectors is actively harmful (the projector then
    injects error components CG cannot remove — measured to turn a
    108-iteration solve into a non-converging one). m defaults to
    max(8k, 64); raise it if fewer vectors come back than asked.
    """
    if m is None:
        m = max(8 * k, 64)
    m = min(m, n)
    if k > m:
        raise ValueError(f"k={k} needs at least m={m} Lanczos steps")

    from cgx.solver.chebyshev import host_matvec, lanczos_tridiag

    # host_matvec: the m SEQUENTIAL mat-vecs would otherwise pay a
    # device dispatch round-trip each on tunneled dev chips
    # (measured: minutes vs seconds for banded operators)
    vs, alphas, betas, beta = lanczos_tridiag(
        host_matvec(op), n, m, seed=seed
    )
    j = len(alphas)
    t = np.diag(alphas)
    if j > 1:
        t += np.diag(betas, 1) + np.diag(betas, -1)
    evals, evecs = np.linalg.eigh(t)
    # Ritz residual bound: ||A y_i - theta_i y_i|| = beta_j |s_{j,i}|
    res_bound = abs(beta) * np.abs(evecs[j - 1, :])
    width = max(float(evals[-1] - evals[0]), np.finfo(np.float64).tiny)
    converged = res_bound <= ritz_tol * width
    keep = np.flatnonzero(converged)[: min(k, j)]
    if keep.size == 0:
        raise ValueError(
            f"no Ritz pair converged in {j} Lanczos steps "
            f"(ritz_tol={ritz_tol}); raise m"
        )
    w_mat = vs[:j].T @ evecs[:, keep]  # (n, k'), converged lowest pairs
    # re-orthonormalize (rounding)
    q, _ = np.linalg.qr(w_mat)
    return q


def deflated_cg_loop(
    tree,
    b,
    x0,
    w,  # (n, k) deflation basis
    aw,  # (n, k) = A W
    minv,  # (k, k) explicit inverse of W^T A W (tiny SPD system;
    #         an inverse-matmul beats per-iteration triangular solves,
    #         which are serial/latency-bound on TPU)
    awtaw,  # (k, k) = (AW)^T AW — lets the drift-guard and the
    #         projector share ONE tall contraction per iteration
    tol,
    nearzero,
    *,
    matvec,
    maxiter: int,
    history: int = 0,
    dot=None,
    tallT=None,  # static callable (M (n,j), v (n,)) -> (j,) M^T v;
    #              the sharded path passes a psum-reducing version
    precond=None,  # static callable (tree, r) -> M^-1 r, or None:
    #                deflated PCG (Saad/Yeung/Erhel/Guyomarc'h 2000,
    #                Alg. 3.6) — directions A-orthogonal to range(W)
    #                AND M-preconditioned; convergence then depends on
    #                the deflated, preconditioned spectrum
):
    if dot is None:
        dot = vdot
    if tallT is None:
        tallT = _local_tallT
    has_pc = precond is not None
    kdim = w.shape[1]
    wa = jnp.concatenate([w, aw], axis=1)  # (n, 2k)

    def mv(v):
        return matvec(tree, v)

    def pc(v):
        return v if precond is None else precond(tree, v)

    def msolve(y):  # (W^T A W)^{-1} y via the precomputed inverse
        return minv @ y

    def proj(v):
        # A-orthogonalise against range(W): v - W (W^T A W)^{-1} (AW)^T v
        return v - w @ msolve(tallT(aw, v))

    # deflation init: shift x so W^T r = 0 from the start
    r = b - mv(x0)
    x = x0 + w @ msolve(tallT(w, r))
    r = b - mv(x)
    z = pc(r)
    p = proj(z)
    rsold = dot(r, z)  # == <r, r> when M == I
    rr0 = rsold if not has_pc else dot(r, r)
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    acc = rr0.dtype
    hist0 = jnp.full((max(history, 1),), jnp.nan, dtype=acc)

    def cond(state):
        k = state[0]
        conv = state[-3]
        return jnp.logical_and(k < maxiter, jnp.logical_not(conv))

    def body(state):
        k, x, r, p, rsold, _, conv, hist, brk = state
        ap = mv(p)
        conj = dot(p, ap)
        brk = jnp.logical_or(brk, conj <= 0)
        alpha = rsold / jnp.maximum(conj, rsold * nearzero)
        x = x + alpha * p
        r = r - alpha * ap
        # FP-drift guard: search directions are _|_A range(W), so the
        # range(W) error component is NEVER corrected by the recurrence
        # — rounding re-seeds it and stalls convergence near the fp64
        # floor. Re-eliminate it each iteration. Without a
        # preconditioner, ONE fused [W, AW]^T r contraction feeds BOTH
        # the guard and the projector: after r <- r - AW corr,
        # (AW)^T r_new = (AW)^T r - (AW)^T AW corr comes from the
        # precomputed awtaw — no second tall reduction. With a
        # preconditioner the projector applies to z = M^-1 r instead,
        # so the guard contracts only W^T r (the AW half would be
        # unused) and the projector pays its own (AW)^T z contraction
        # — which XLA's combiner merges into the rsnew/rr launch
        # (pinned in tests/test_collective_counts.py).
        if has_pc:
            corr = msolve(tallT(w, r))
        else:
            c2 = tallT(wa, r)
            corr = msolve(c2[:kdim])
        x = x + w @ corr
        r = r - aw @ corr
        if has_pc:
            z = pc(r)
            rsnew = dot(r, z)
            rr = dot(r, r)
            zproj = z - w @ msolve(tallT(aw, z))
        else:
            awr_new = c2[kdim:] - awtaw @ corr
            rsnew = dot(r, r)
            rr = rsnew
            zproj = r - w @ msolve(awr_new)
        res = jnp.sqrt(rr)
        if history > 0:
            hist = hist.at[k].set(res.astype(acc), mode="drop")
        converged = res < tol
        # projected direction keeps p _|_A range(W) throughout
        p_next = zproj + (rsnew / rsold) * p
        p = jnp.where(converged, p, p_next)
        rsold_n = jnp.where(converged, rsold, rsnew)
        k_n = jnp.where(converged, k, k + 1)
        return (k_n, x, r, p, rsold_n, rr, converged, hist, brk)

    state0 = (
        jnp.asarray(0, jnp.int32), x, r, p, rsold, rr0,
        pre_conv, hist0, jnp.asarray(False),
    )
    k, x, r, p, rsold, rr, conv, hist, brk = jax.lax.while_loop(
        cond, body, state0
    )
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        converged=conv,
        rsold=rsold,
        history=hist if history > 0 else hist[:0],
        breakdown=brk,
    )


def _local_tallT(m_, v):
    return jnp.einsum(
        "nk,n->k", m_, v, precision=jax.lax.Precision.HIGHEST
    )


_deflated_jit = partial(
    jax.jit,
    static_argnames=(
        "matvec", "maxiter", "history", "dot", "tallT", "precond",
    ),
)(_f32_exact(deflated_cg_loop))


class DeflationBasis:
    """Precomputed deflation data for one operator: W, AW, and the
    inverse of W^T A W — build once, reuse across a solve sequence."""

    def __init__(self, op, w):
        w = jnp.asarray(w, op.dtype)
        aw = jax.vmap(op.matvec, in_axes=1, out_axes=1)(w)
        m = jnp.einsum(
            "nk,nl->kl", w, aw, precision=jax.lax.Precision.HIGHEST
        )
        self.w = w
        self.aw = aw
        # explicit inverse: cond(W^T A W) <= lambda_k/lambda_1 of the
        # DEFLATED window — modest — and a (k, k) matmul per apply is
        # far cheaper on TPU than triangular solves. Inverted on HOST:
        # it is setup-time work and TPU XLA has no fp64 LU expansion
        # ("Only F32 and C64 types are implemented in LuDecomposition").
        self.minv = jnp.asarray(
            np.linalg.inv(np.asarray(m, np.float64)), op.dtype
        )
        self.awtaw = jnp.einsum(
            "nk,nl->kl", aw, aw, precision=jax.lax.Precision.HIGHEST
        )
        self.op = op

    @classmethod
    def from_lanczos(cls, op, k: int = 8, *, m: Optional[int] = None,
                     seed: int = 0) -> "DeflationBasis":
        n = op.shape[0]
        return cls(op, lanczos_ritz(op, n, k, m=m, seed=seed))


def _harvest_cg_loop(
    tree,
    b,
    x0,
    tol,
    nearzero,
    *,
    matvec,
    maxiter: int,
    window: int,
    dot=None,  # static <a,b> -> scalar; the sharded path passes a
    #            psum-reducing dot (cgx/parallel/sharded_cg.py)
):
    """Reference-recurrence CG (cg.py semantics) that additionally
    captures the first ``window`` Lanczos vectors and recurrence
    scalars. By the CG<->Lanczos equivalence the normalized residuals
    ARE the Lanczos vectors, v_j = (-1)^j r_j/||r_j||, and the CG
    scalars define the tridiagonal:

        T[j,j]   = 1/alpha_j + beta_{j-1}/alpha_{j-1}   (beta_{-1}=0)
        T[j,j+1] = sqrt(beta_j)/alpha_j

    (Saad, Iterative Methods, §6.7.3.) Capturing them costs ZERO extra
    mat-vecs — the harvest recycles work the solve does anyway,
    whereas :func:`lanczos_ritz` pays m dedicated mat-vecs."""
    if dot is None:
        dot = vdot

    def mv(p):
        return matvec(tree, p)

    r = b - mv(x0)
    p = r
    rsold = dot(r, r)
    pre_conv = jnp.logical_or(jnp.sqrt(rsold) < tol, rsold == 0)
    win0 = jnp.zeros((window, b.shape[0]), b.dtype)
    av0 = jnp.zeros((window,), b.dtype)
    bv0 = jnp.zeros((window,), b.dtype)

    def cond(state):
        k = state[0]
        converged = state[6]
        return jnp.logical_and(k < maxiter, jnp.logical_not(converged))

    def body(state):
        (k, x, r, p, rsold, rsnew_prev, _, brk, win, av, bv) = state
        # capture BEFORE the update: v_k = (-1)^k r_k / ||r_k||
        sign = jnp.where(k % 2 == 0, 1.0, -1.0).astype(b.dtype)
        win = win.at[k].set(
            (sign / jnp.sqrt(rsold)).astype(b.dtype) * r, mode="drop"
        )
        ap = mv(p)
        conj = dot(p, ap)
        brk = jnp.logical_or(brk, conj <= 0)
        alpha = rsold / jnp.maximum(conj, rsold * nearzero)
        x = x + alpha * p
        r = r - alpha * ap
        rsnew = dot(r, r)
        beta = rsnew / rsold
        av = av.at[k].set(alpha.astype(b.dtype), mode="drop")
        bv = bv.at[k].set(beta.astype(b.dtype), mode="drop")
        converged = jnp.sqrt(rsnew) < tol
        p_n = jnp.where(converged, p, r + beta * p)
        rsold_n = jnp.where(converged, rsold, rsnew)
        k_n = jnp.where(converged, k, k + 1)
        return (k_n, x, r, p_n, rsold_n, rsnew, converged, brk, win, av, bv)

    state0 = (
        jnp.asarray(0, jnp.int32), x0, r, p, rsold, rsold, pre_conv,
        jnp.asarray(False), win0, av0, bv0,
    )
    (k, x, r, p, rsold, rsnew, conv, brk, win, av, bv) = jax.lax.while_loop(
        cond, body, state0
    )
    res = CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rsnew),
        converged=conv,
        rsold=rsold,
        history=jnp.zeros((0,), b.dtype),
        breakdown=brk,
    )
    return res, win, av, bv


_harvest_jit = partial(
    jax.jit, static_argnames=("matvec", "maxiter", "window", "dot")
)(_f32_exact(_harvest_cg_loop))


def _ritz_from_cg_window(
    win: np.ndarray,
    av: np.ndarray,
    bv: np.ndarray,
    steps: int,
    k: int,
    ritz_tol: float,
) -> np.ndarray:
    """Lowest converged Ritz vectors from a CG-harvested Lanczos window
    (host eigh of the scalar-built tridiagonal). CG runs WITHOUT
    reorthogonalization, so ghost (duplicate) Ritz directions can
    appear once the window spans converged eigenvalues — an SVD filter
    collapses them (deflation needs range(W), not labeled columns;
    near-dependent columns would make W^T A W singular)."""
    mm = int(steps)
    if mm < 2:
        raise ValueError(
            f"only {mm} CG steps captured; nothing to harvest"
        )
    a = np.asarray(av[:mm], np.float64)
    bb = np.asarray(bv[:mm], np.float64)
    d = 1.0 / a
    d[1:] += bb[:-1] / a[:-1]
    e = np.sqrt(np.maximum(bb[:-1], 0.0)) / a[:-1]
    t = np.diag(d)
    if mm > 1:
        t += np.diag(e, 1) + np.diag(e, -1)
    evals, evecs = np.linalg.eigh(t)
    # Ritz residual bound: ||A y_i - theta_i y_i|| = beta_mm |s_{mm,i}|
    tail = (np.sqrt(max(float(bb[mm - 1]), 0.0)) / float(a[mm - 1]))
    res_bound = tail * np.abs(evecs[mm - 1, :])
    width = max(float(evals[-1] - evals[0]), np.finfo(np.float64).tiny)
    keep = np.flatnonzero(res_bound <= ritz_tol * width)[: min(k, mm)]
    if keep.size == 0:
        raise ValueError(
            f"no Ritz pair converged in the {mm}-step CG window "
            f"(ritz_tol={ritz_tol}); raise the window or ritz_tol"
        )
    w_mat = np.asarray(win[:mm], np.float64).T @ evecs[:, keep]
    # ghost collapse + orthonormalization in one SVD
    u, s, _ = np.linalg.svd(w_mat, full_matrices=False)
    rank = int(np.sum(s > 1e-6 * s[0]))
    return u[:, :rank]


def cg_solve_harvest(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    k: int = 8,
    window: Optional[int] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    ritz_tol: float = 1e-3,
    strict: bool = True,
) -> Tuple[CGResult, Optional[DeflationBasis]]:
    """Solve ``A x = b`` with plain CG AND harvest a deflation basis
    from the solve's own iterates — the recycling entry point for
    solve SEQUENCES (time stepping, outer optimisation loops):

        res0, basis = cg_solve_harvest(op, b0, k=16)
        res1 = deflated_cg_solve(op, b1, basis)   # fewer iterations
        res2 = deflated_cg_solve(op, b2, basis)   # ...

    Unlike :meth:`DeflationBasis.from_lanczos` (m dedicated mat-vecs),
    the harvest costs zero extra mat-vecs: the CG residuals are the
    Lanczos vectors and the CG scalars build the tridiagonal (see
    :func:`_harvest_cg_loop`). ``window`` (default max(8k, 64),
    capped by maxiter) bounds the captured rows and hence memory
    (window x n). Raises if no Ritz pair converges in the window;
    with ``strict=False`` it returns ``(result, None)`` instead — the
    completed solve is never discarded."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if window is None:
        window = max(8 * k, 64)
    window = int(min(window, maxiter, n))
    if not hasattr(a, "matvec"):
        raise TypeError("cg_solve_harvest needs an operator with .matvec")
    res, win, av, bv = _harvest_jit(
        a,
        b,
        x0,
        jnp.asarray(tol, b.dtype),
        jnp.asarray(nearzero, b.dtype),
        matvec=_call,
        maxiter=int(maxiter),
        window=window,
    )
    steps = min(int(res.iterations) + 1, window)
    try:
        w = _ritz_from_cg_window(
            np.asarray(win), np.asarray(av), np.asarray(bv), steps, k,
            ritz_tol,
        )
    except ValueError:
        if strict:
            raise
        return res, None
    return res, DeflationBasis(a, w)


def deflated_cg_solve(
    a,
    b: jnp.ndarray,
    basis: DeflationBasis,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    precond=None,
) -> CGResult:
    """Solve ``A x = b`` with CG deflated by ``basis`` (built once per
    operator via :meth:`DeflationBasis.from_lanczos` or from any
    (n, k) approximate-eigenvector matrix). ``precond`` is an optional
    ``r -> M^-1 r`` apply (e.g. from cgx.solver.precond): deflated PCG
    — the two accelerations compose, deflation removing the isolated
    low modes and M the rest of the spectrum."""
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if not hasattr(a, "matvec"):
        raise TypeError("deflated_cg_solve needs an operator with .matvec")
    from cgx.solver.cg import _ClosurePrecond

    static_pc = None if precond is None else _ClosurePrecond(precond)
    return _deflated_jit(
        a,
        b,
        x0,
        basis.w,
        basis.aw,
        basis.minv,
        basis.awtaw,
        jnp.asarray(tol, b.dtype),
        jnp.asarray(nearzero, b.dtype),
        matvec=_call,
        maxiter=int(maxiter),
        history=int(history),
        precond=static_pc,
    )


def _call(tree, v):
    return tree.matvec(v)
