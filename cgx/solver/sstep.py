"""s-step (communication-avoiding) CG: s iterations per ONE reduction.

The reference's CG pays 2 latency-bound all-reduces per iteration
(cg.cc:106,117) and the pipelined variant fuses them into 1; s-step CG
goes further: it runs ``s`` mathematically-exact CG iterations per
single global reduction. Per outer block it

  1. builds a degree-s Krylov basis  V = [T_0(A)p .. T_s(A)p,
     U_0(A)r .. U_{s-1}(A)r]   (2s+1 tall vectors; the mat-vecs
     communicate only halos on the sharded path),
  2. forms the Gram matrix  G = V^T V  with ONE all-reduce of
     (2s+1)^2 scalars,
  3. replays s classic-CG scalar recurrences entirely in coefficient
     space (alpha/beta from tiny G-quadratic forms — zero
     communication, zero long-vector traffic),
  4. recovers x, r, p with three tall-matrix-times-small-vector
     products and repeats.

In exact arithmetic the iterates equal classic CG's (Chronopoulos &
Gear 1989; Carson 2015, "Communication-Avoiding Krylov Subspace
Methods" — PAPERS.md). In floating point the monomial basis
[p, Ap, A^2 p, ...] is infamously ill-conditioned (kappa^s growth), so
the basis here is the **Chebyshev basis** on the Lanczos-estimated
spectral interval (:func:`cgx.solver.chebyshev.lanczos_bounds`):

    T_0 = v,  T_1 = (A - theta I) v / delta,
    T_{i+1} = 2 (A - theta I) T_i / delta - T_{i-1}

whose columns stay O(1) in norm — the standard CA-Krylov stabilisation
(Hoemmen 2010). A's action on the basis is then the tridiagonal
operator B:  A T_i = theta T_i + (delta/2)(T_{i-1} + T_{i+1}), with
A T_0 = theta T_0 + delta T_1. The recurrences only ever apply B to
coefficients of degree < s, so the (absent) images of the top-degree
columns are never needed.

Communication per s iterations: s halo exchanges (basis mat-vecs) +
ONE psum of (2s+1)^2 floats — vs the reference's 2s scalar
all-reduces + s allgathers. The trade: 2s+1 resident tall vectors and
the basis conditioning limit on s (s <= ~8 at fp64 for Laplacian-like
spectra; default 4).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.solver.cg import CGResult


def _basis_matrix(s: int, theta: float, delta: float, dtype) -> np.ndarray:
    """The (2s+1)x(2s+1) operator matrix B with A V = V B on all
    columns the recurrences touch (top-degree columns excluded)."""
    m = 2 * s + 1
    b = np.zeros((m, m))

    def fill(base: int, width: int):
        # Chebyshev three-term structure on one block of `width` columns
        if width >= 2:
            b[base + 0, base + 0] = theta
            b[base + 1, base + 0] = delta
        for i in range(1, width - 1):
            b[base + i - 1, base + i] = delta / 2.0
            b[base + i, base + i] = theta
            b[base + i + 1, base + i] = delta / 2.0
        # the block's final column is the top degree: its image is not
        # representable and is never requested — leave it zero

    fill(0, s + 1)  # p-part: degrees 0..s
    fill(s + 1, s)  # r-part: degrees 0..s-1
    return b.astype(dtype)


def sstep_cg_loop(
    tree,
    b,
    x0,
    tol,
    nearzero,
    *,
    matvec,  # static callable (tree, v) -> A v
    s: int,
    maxiter: int,
    theta: float,
    delta: float,
    gram=None,  # static callable V (n, m) -> V^T V (m, m); the sharded
    #             path passes a psum-reducing Gram (ONE all-reduce)
):
    if gram is None:
        gram = _local_gram
    dtype = b.dtype
    m = 2 * s + 1
    th = jnp.asarray(theta, dtype)
    dl = jnp.asarray(delta, dtype)
    bmat = jnp.asarray(_basis_matrix(s, theta, delta, np.float64), dtype)

    def mv(v):
        return matvec(tree, v)

    def cheb_cols(v0, width: int):
        """[T_0(A)v .. T_{width-1}(A)v] by the three-term recurrence."""
        cols = [v0]
        if width >= 2:
            cols.append((mv(v0) - th * v0) / dl)
        for _ in range(2, width):
            t_prev, t_cur = cols[-2], cols[-1]
            cols.append(2.0 * (mv(t_cur) - th * t_cur) / dl - t_prev)
        return cols

    r0 = b - mv(x0)
    rs0 = gram(r0[:, None])[0, 0]
    pre_conv = jnp.logical_or(jnp.sqrt(rs0) < tol, rs0 == 0)

    def cond(state):
        k, x, r, p, rsold, rsnew, conv, brk = state
        return jnp.logical_and(k < maxiter, jnp.logical_not(conv))

    def body(state):
        k, x, r, p, rsold, rsnew, conv, brk = state
        v = jnp.stack(cheb_cols(p, s + 1) + cheb_cols(r, s), axis=1)  # (n, m)
        g = gram(v)  # ONE reduction for the whole block

        c = jnp.zeros((m,), dtype).at[0].set(1.0)  # p in basis coords
        d = jnp.zeros((m,), dtype).at[s + 1].set(1.0)  # r in basis coords
        xc = jnp.zeros((m,), dtype)
        rs = d @ g @ d
        # replay s reference-recurrence iterations in coefficient space
        for _ in range(s):
            active = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
            bc = bmat @ c  # A p_j in basis coords
            conj = c @ g @ bc
            brk = jnp.logical_or(brk, jnp.logical_and(active, conj <= 0))
            alpha = rs / jnp.maximum(conj, rs * nearzero)
            xc_n = xc + alpha * c
            d_n = d - alpha * bc
            rr = d_n @ g @ d_n
            conv_now = jnp.sqrt(rr) < tol
            adv = jnp.logical_and(active, jnp.logical_not(conv_now))
            beta = rr / rs
            c_n = d_n + beta * c
            # reference break semantics: on convergence x/r advance,
            # p/rsold/k freeze (cg.cc:120-129 / cgx.solver.cg)
            xc = jnp.where(active, xc_n, xc)
            d = jnp.where(active, d_n, d)
            rsnew = jnp.where(active, rr, rsnew)
            c = jnp.where(adv, c_n, c)
            rsold_new = jnp.where(adv, rr, rs)
            rs = jnp.where(active, rsold_new, rs)
            k = jnp.where(adv, k + 1, k)
            conv = jnp.logical_or(conv, jnp.logical_and(active, conv_now))
        # recover the tall vectors (local, no communication)
        x = x + v @ xc
        r = v @ d
        p = v @ c
        return (k, x, r, p, rs, rsnew, conv, brk)

    state0 = (
        jnp.asarray(0, jnp.int32),
        x0,
        r0,
        r0,  # p_0 = r_0
        rs0,
        rs0,
        pre_conv,
        jnp.asarray(False),
    )
    k, x, r, p, rsold, rsnew, conv, brk = jax.lax.while_loop(
        cond, body, state0
    )
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rsnew),
        converged=conv,
        rsold=rsold,
        history=jnp.zeros((0,), dtype),
        breakdown=brk,
    )


def _local_gram(v):
    return jnp.einsum("nm,nk->mk", v, v, precision=jax.lax.Precision.HIGHEST)


_sstep_jit = partial(
    jax.jit,
    static_argnames=("matvec", "s", "maxiter", "theta", "delta", "gram"),
)(sstep_cg_loop)


def sstep_cg_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    s: int = 4,
    bounds: Optional[Tuple[float, float]] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
) -> CGResult:
    """Solve SPD ``A x = b`` by s-step CG (one reduction per s
    iterations; classic-CG iterates in exact arithmetic).

    Args:
      s: block size (iterations per reduction). fp64 handles s <= ~8
        on Laplacian-like spectra; the Chebyshev basis keeps columns
        O(1) so the practical limit is the A-inner-product conditioning
        of the block, not column overflow.
      bounds: (lmin, lmax) for the Chebyshev basis interval; estimated
        via :func:`cgx.solver.chebyshev.spectral_bounds` when omitted.
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        from cgx.solver.operators import DenseOperator

        a = DenseOperator(a)
    if bounds is None:
        from cgx.solver.chebyshev import spectral_bounds

        bounds = spectral_bounds(a, n)
    lmin, lmax = float(bounds[0]), float(bounds[1])
    if not (0 < lmin < lmax):
        raise ValueError(f"invalid spectral bounds {bounds}")
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    if not hasattr(a, "matvec"):
        raise TypeError("sstep_cg_solve needs an operator with .matvec")
    return _sstep_jit(
        a,
        b,
        x0,
        jnp.asarray(tol, b.dtype),
        jnp.asarray(nearzero, b.dtype),
        matvec=_call,
        s=int(s),
        maxiter=int(maxiter),
        theta=theta,
        delta=delta,
    )


def _call(tree, v):
    return tree.matvec(v)
