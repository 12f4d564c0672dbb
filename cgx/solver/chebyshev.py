"""Chebyshev iteration: the zero-reduction Krylov method.

The communication story taken to its endpoint: CG needs 2 reductions
per iteration (the reference's two MPI_Allreduce), pipelined CG needs
1 fused reduction — Chebyshev needs **zero**. Given bounds
``[lmin, lmax]`` on the SPD spectrum, its recurrence uses only
precomputed scalars, so a sharded run communicates nothing but the
mat-vec halos, plus one optional psum every ``check_every`` iterations
for the convergence test. The price is the spectral-bound requirement
and a (sqrt(kappa)-matched but constant-factor-worse) iteration count
vs CG; it shines latency-bound (large meshes, small N/p) and as a
smoother.

Bounds come from :func:`spectral_bounds` (power iteration for lmax +
Gershgorin floor for lmin) or from the caller.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.config import DEFAULT_TOLERANCE
from cgx.ops.reduce import vdot
from cgx.solver.cg import CGResult, _ClosureMatvec
from cgx.solver.operators import DiaOperator


def gershgorin_bounds(mat) -> Tuple[float, float]:
    """Gershgorin disc bounds for a host matrix (DIAMatrix or dense
    ndarray): lmin >= min_i (a_ii - sum_j|a_ij|), lmax <= max_i
    (a_ii + sum_j |a_ij|). The lower bound is often 0 for Laplacians —
    pair with :func:`spectral_bounds` for a usable lmin."""
    from cgx.mats.containers import DIAMatrix

    if isinstance(mat, DIAMatrix):
        d0 = mat.offsets.index(0)
        diag = mat.bands[d0]
        off = sum(
            np.abs(mat.bands[d]) for d in range(len(mat.offsets)) if d != d0
        )
    else:
        a = np.asarray(mat)
        diag = np.diagonal(a)
        off = np.abs(a).sum(axis=1) - np.abs(diag)
    return float((diag - off).min()), float((diag + off).max())


@partial(jax.jit, static_argnames=("matvec", "iters"))
def _power_iter(tree, v0, *, matvec, iters: int):
    def body(i, carry):
        v, lam = carry
        w = matvec(tree, v)
        lam = jnp.sqrt(vdot(w, w)) / jnp.maximum(
            jnp.sqrt(vdot(v, v)), jnp.finfo(v.dtype).tiny
        )
        return w / jnp.maximum(jnp.sqrt(vdot(w, w)), jnp.finfo(v.dtype).tiny), lam

    v, lam = jax.lax.fori_loop(0, iters, body, (v0, jnp.zeros((), v0.dtype)))
    return lam


def spectral_bounds(
    op, n: int, *, iters: int = 30, lmin_floor_ratio: float = 1e-4
) -> Tuple[float, float]:
    """(lmin, lmax) estimate: power iteration for lmax (safeguarded by
    +5%), Gershgorin lower bound floored at ``lmin_floor_ratio*lmax``
    (a too-small lmin only slows Chebyshev; a too-large one diverges)."""
    if not hasattr(op, "matvec"):
        raise TypeError(
            "spectral_bounds needs an operator with .matvec; wrap bare "
            "callables in an operator or pass bounds= explicitly"
        )
    v0 = jnp.asarray(np.random.default_rng(0).standard_normal(n), op.dtype)
    lam = float(_power_iter(op, v0, matvec=_call, iters=iters))
    lmax = 1.05 * lam
    lmin = lmin_floor_ratio * lmax
    try:
        from cgx.mats.containers import DIAMatrix

        host = DIAMatrix(
            op.shape, tuple(op.offsets), np.asarray(op.bands, np.float64)
        ) if isinstance(op, DiaOperator) else None
        if host is not None:
            g_lo, _ = gershgorin_bounds(host)
            if g_lo > lmin:
                lmin = g_lo
    except Exception:  # noqa: BLE001 — bounds are best-effort
        pass
    return lmin, lmax


def _call(tree, x):
    return tree.matvec(x)


@partial(
    jax.jit,
    static_argnames=("matvec", "maxiter", "check_every"),
)
def _cheby_loop(
    tree, b, x0, lmin, lmax, tol, *, matvec, maxiter: int, check_every: int
):
    dtype = b.dtype
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def mv(v):
        return matvec(tree, v)

    r = b - mv(x0)
    rr0 = vdot(r, r)
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    p = r / theta

    def cond(state):
        k, x, r, p, rho_old, rr, conv = state
        return jnp.logical_and(k < maxiter, jnp.logical_not(conv))

    def body(state):
        k, x, r, p, rho_old, rr, conv = state
        x = x + p
        r = r - mv(p)
        rho = 1.0 / (2.0 * sigma1 - rho_old)
        p = (rho * rho_old).astype(dtype) * p + (2.0 * rho / delta).astype(
            dtype
        ) * r
        # the ONLY reduction, genuinely amortized: lax.cond executes a
        # single branch, so off-check iterations skip the O(n) dot (and,
        # sharded, its psum) entirely
        do_check = (k + 1) % check_every == 0
        rr = jax.lax.cond(do_check, lambda rv: vdot(rv, rv), lambda rv: rr, r)
        conv = jnp.logical_and(do_check, jnp.sqrt(rr) < tol)
        return (k + 1, x, r, p, rho, rr, conv)

    state0 = (
        jnp.asarray(0, jnp.int32),
        x0,
        r,
        p,
        jnp.asarray(1.0 / sigma1, dtype),
        rr0,
        pre_conv,
    )
    k, x, r, p, rho_old, rr, conv = jax.lax.while_loop(cond, body, state0)
    rr_final = vdot(r, r)
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rr_final),
        converged=jnp.sqrt(rr_final) < tol,
        rsold=rr,
        history=jnp.zeros((0,), dtype),
        breakdown=jnp.asarray(False),
    )


def chebyshev_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    bounds: Optional[Tuple[float, float]] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    check_every: int = 32,
) -> CGResult:
    """Solve SPD ``A x = b`` by Chebyshev iteration.

    Args:
      bounds: (lmin, lmax) spectral bounds; estimated via
        :func:`spectral_bounds` when omitted (costs ~30 mat-vecs once).
      check_every: iterations between convergence checks — the only
        reduction in the loop (per-iteration collectives: ZERO).
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = 4 * n  # Chebyshev trades constant factors for comm
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        from cgx.solver.operators import DenseOperator

        a = DenseOperator(a)
    if bounds is None:
        if not hasattr(a, "matvec"):
            raise ValueError("bounds= is required for bare-callable operators")
        bounds = spectral_bounds(a, n)
    lmin, lmax = bounds
    if not (0 < lmin < lmax):
        raise ValueError(f"invalid spectral bounds {bounds}")
    if hasattr(a, "matvec"):
        tree, static_mv = a, _call
    else:
        tree, static_mv = None, _ClosureMatvec(a)
    return _cheby_loop(
        tree,
        b,
        x0,
        jnp.asarray(lmin, b.dtype),
        jnp.asarray(lmax, b.dtype),
        jnp.asarray(tol, b.dtype),
        matvec=static_mv,
        maxiter=int(maxiter),
        check_every=int(check_every),
    )
