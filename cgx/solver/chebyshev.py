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
    """Gershgorin disc bounds for a host matrix (DIA/ELL/Dense/ndarray):
    lmin >= min_i (a_ii - sum_j|a_ij|), lmax <= max_i
    (a_ii + sum_j |a_ij|). The lower bound is often 0 for Laplacians —
    pair with :func:`spectral_bounds` for a usable lmin."""
    from cgx.mats.containers import DenseMatrix, DIAMatrix, ELLMatrix

    if isinstance(mat, DIAMatrix):
        d0 = mat.offsets.index(0)
        diag = mat.bands[d0]
        off = sum(
            np.abs(mat.bands[d]) for d in range(len(mat.offsets)) if d != d0
        )
    elif isinstance(mat, ELLMatrix):
        on_diag = mat.indices == np.arange(mat.shape[0])[:, None]
        diag = np.where(on_diag, mat.values, 0.0).sum(axis=1)
        off = np.abs(np.where(on_diag, 0.0, mat.values)).sum(axis=1)
    else:
        a = mat.a if isinstance(mat, DenseMatrix) else np.asarray(mat)
        diag = np.diagonal(a)
        off = np.abs(a).sum(axis=1) - np.abs(diag)
    return float((diag - off).min()), float((diag + off).max())


def host_matvec(obj):
    """Best-available HOST (NumPy) mat-vec for an operator or
    container. Lanczos passes are m SEQUENTIAL mat-vecs; on tunneled
    dev chips each device call pays a fixed dispatch round-trip
    (BENCHMARKS.md methodology), so spectral estimation always prefers
    a vectorized host path when the matrix data is reachable."""
    from cgx.mats.containers import (
        CSRMatrix,
        DenseMatrix,
        DIAMatrix,
        ELLMatrix,
    )
    from cgx.solver.operators import DiaOperator

    if isinstance(obj, DiaOperator):
        host = DIAMatrix(
            obj.shape, tuple(obj.offsets), np.asarray(obj.bands, np.float64)
        )
        return host.mat_vec
    if isinstance(obj, CSRMatrix):
        # CSRMatrix.mat_vec is the per-row serial oracle; Lanczos needs
        # the vectorized form (bincount over precomputed row ids)
        row_ids = np.repeat(
            np.arange(obj.shape[0]), np.diff(obj.indptr)
        )
        values = np.asarray(obj.values, np.float64)
        indices = np.asarray(obj.indices)
        m_rows = obj.shape[0]

        def mv_csr(x):
            return np.bincount(
                row_ids, weights=values * x[indices], minlength=m_rows
            )

        return mv_csr
    if isinstance(obj, (DIAMatrix, ELLMatrix)):
        return obj.mat_vec
    if isinstance(obj, DenseMatrix):
        return lambda x, a=np.asarray(obj.a, np.float64): a @ x
    if isinstance(obj, np.ndarray):
        return lambda x, a=np.asarray(obj, np.float64): a @ x
    if hasattr(obj, "mat_vec"):
        return obj.mat_vec
    if hasattr(obj, "matvec"):
        return lambda x: np.asarray(
            obj.matvec(jnp.asarray(x, obj.dtype)), np.float64
        )
    raise TypeError(f"no host mat-vec for {type(obj)}")


def lanczos_tridiag(mv, n: int, m: int, *, seed: int = 0):
    """m-step Lanczos with full reorthogonalization (host NumPy).

    Returns ``(V (j, n), alphas (j,), betas (j-1,), beta_last)`` with
    j <= m (early exit on an invariant subspace). Shared by
    :func:`lanczos_bounds` and :func:`cgx.solver.deflated.lanczos_ritz`
    so the numerically delicate loop exists once.
    """
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    vs = np.empty((m, n))
    alphas: list = []
    betas: list = []
    beta = 0.0
    v_prev = np.zeros(n)
    for j in range(m):
        vs[j] = v
        w = np.asarray(mv(v), np.float64)
        alpha = float(v @ w)
        w = w - alpha * v - beta * v_prev
        # full reorthogonalization (tiny m: O(m n) per step)
        w -= vs[: j + 1].T @ (vs[: j + 1] @ w)
        alphas.append(alpha)
        beta = float(np.linalg.norm(w))
        if beta < 1e-12 * max(abs(alpha), 1.0):
            break  # invariant subspace: Ritz values are exact
        betas.append(beta)
        v_prev = v
        v = w / beta
    j = len(alphas)
    return (
        vs[:j],
        np.asarray(alphas),
        np.asarray(betas[: j - 1]),
        beta,
    )


def lanczos_bounds(
    matvec,
    n: int,
    *,
    m: int = 64,
    safety: Tuple[float, float] = (0.5, 1.05),
    lmin_floor_ratio: float = 1e-4,
    seed: int = 0,
) -> Tuple[float, float]:
    """Spectral-interval estimate by ``m``-step Lanczos with full
    reorthogonalization (NumPy orchestration; ``matvec`` may run on
    device or host).

    Ritz values lie INSIDE the spectrum (theta_min >= lambda_min,
    theta_max <= lambda_max), hence the asymmetric safety factors:
    returns ``(safety[0] * theta_min, safety[1] * theta_max)``. For
    Chebyshev an overestimated lmin diverges while an underestimated
    one only adds iterations, so the 2x lmin margin is the cheap
    direction. ~64 steps resolve both spectrum ends to a few percent
    for the Laplacian-like operators this library targets — the tight
    lmin is what makes Chebyshev (and the chebyshev_banded
    preconditioner) competitive vs the 1e-4*lmax floor the power-
    iteration estimate had to assume.
    """
    m = min(m, n)
    _, alphas, betas, _ = lanczos_tridiag(matvec, n, m, seed=seed)
    k = len(alphas)
    t = np.diag(alphas)
    if k > 1:
        t += np.diag(betas, 1) + np.diag(betas, -1)
    ritz = np.linalg.eigvalsh(t)
    lmax = safety[1] * float(ritz[-1])
    lmin = safety[0] * float(ritz[0])
    if lmin <= 0:
        lmin = lmin_floor_ratio * lmax
    return lmin, lmax


def host_spectral_bounds(
    mat, *, m: int = 64, lmin_floor_ratio: float = 1e-4
) -> Tuple[float, float]:
    """(lmin, lmax) estimate computed on the HOST (NumPy) from a host
    container — the sharded entry point's bounds source, run once
    before the matrix is padded and device_put.

    Lanczos (:func:`lanczos_bounds`) for both ends, then tightened with
    the guaranteed Gershgorin bounds where those are sharper: lmin is
    raised to the Gershgorin floor when positive, lmax clamped to the
    Gershgorin ceiling (>= lambda_max always, so the 5% Lanczos safety
    margin never overshoots it).
    """
    n = mat.shape[0]
    lmin, lmax = lanczos_bounds(
        host_matvec(mat), n, m=m, lmin_floor_ratio=lmin_floor_ratio
    )
    try:
        g_lo, g_hi = gershgorin_bounds(mat)
        lmin = max(lmin, g_lo)
        lmax = min(lmax, g_hi)
    except Exception:  # noqa: BLE001 — bounds are best-effort
        pass
    return lmin, lmax


def spectral_bounds(
    op, n: int, *, m: int = 64, lmin_floor_ratio: float = 1e-4
) -> Tuple[float, float]:
    """(lmin, lmax) estimate for a DEVICE operator: Lanczos
    (:func:`lanczos_bounds`) over the best-available host mat-vec
    (banded operators run the m sequential steps entirely on the host
    — per-step device dispatch latency dominates on tunneled chips),
    tightened with Gershgorin for banded operators."""
    if not hasattr(op, "matvec"):
        raise TypeError(
            "spectral_bounds needs an operator with .matvec; wrap bare "
            "callables in an operator or pass bounds= explicitly"
        )
    lmin, lmax = lanczos_bounds(
        host_matvec(op), n, m=m, lmin_floor_ratio=lmin_floor_ratio
    )
    try:
        from cgx.mats.containers import DIAMatrix

        host = DIAMatrix(
            op.shape, tuple(op.offsets), np.asarray(op.bands, np.float64)
        ) if isinstance(op, DiaOperator) else None
        if host is not None:
            g_lo, g_hi = gershgorin_bounds(host)
            lmin = max(lmin, g_lo)
            lmax = min(lmax, g_hi)
    except Exception:  # noqa: BLE001 — bounds are best-effort
        pass
    return lmin, lmax


def _call(tree, x):
    return tree.matvec(x)


def cheby_loop(
    tree,
    b,
    x0,
    lmin,
    lmax,
    tol,
    *,
    matvec,  # static callable taking (operator_tree, x)
    maxiter: int,
    check_every: int,
    dot=None,  # static callable <a,b> -> scalar; default local VPU vdot.
    #           The sharded path passes a psum-reducing dot so the same
    #           loop runs under shard_map (cgx/parallel/sharded_cg.py);
    #           it fires only every ``check_every`` iterations.
):
    if dot is None:
        dot = vdot
    dtype = b.dtype
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    sigma1 = theta / delta

    def mv(v):
        return matvec(tree, v)

    r = b - mv(x0)
    rr0 = dot(r, r)
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
        rr = jax.lax.cond(do_check, lambda rv: dot(rv, rv), lambda rv: rr, r)
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
    rr_final = dot(r, r)
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rr_final),
        converged=jnp.sqrt(rr_final) < tol,
        rsold=rr,
        history=jnp.zeros((0,), dtype),
        breakdown=jnp.asarray(False),
    )


_cheby_loop = partial(
    jax.jit, static_argnames=("matvec", "maxiter", "check_every", "dot")
)(cheby_loop)


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
