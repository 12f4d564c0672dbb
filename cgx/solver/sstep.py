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
from cgx.ops._util import f32_exact as _f32_exact
from cgx.solver.cg import CGResult


def _basis_matrix(
    s: int,
    theta: float,
    delta: float,
    dtype,
    shifts: Tuple[float, ...] = (),
) -> np.ndarray:
    """The (2s+1)x(2s+1) operator matrix B with A V = V B on all
    columns the recurrences touch (top-degree columns excluded).

    With ``shifts`` empty: Chebyshev three-term structure. With s Leja-
    ordered shifts: the scaled-Newton bidiagonal
    ``A v_i = shifts[i] v_i + sigma v_{i+1}`` with sigma = delta/2
    (the capacity of the spectral interval — keeps column norms O(1)
    for Leja-ordered points, Hoemmen 2010 §7.3)."""
    m = 2 * s + 1
    b = np.zeros((m, m))

    if shifts:
        sigma = delta / 2.0

        def fill(base: int, width: int):
            for i in range(width - 1):
                b[base + i, base + i] = shifts[i]
                b[base + i + 1, base + i] = sigma
            # final column is the top degree: image never requested

    else:

        def fill(base: int, width: int):
            # Chebyshev three-term structure on one `width`-column block
            if width >= 2:
                b[base + 0, base + 0] = theta
                b[base + 1, base + 0] = delta
            for i in range(1, width - 1):
                b[base + i - 1, base + i] = delta / 2.0
                b[base + i, base + i] = theta
                b[base + i + 1, base + i] = delta / 2.0
            # the block's final column is the top degree: its image is
            # not representable and is never requested — leave it zero

    fill(0, s + 1)  # p-part: degrees 0..s
    fill(s + 1, s)  # r-part: degrees 0..s-1
    return b.astype(dtype)


def leja_order(vals: np.ndarray) -> np.ndarray:
    """Greedy Leja ordering: start from the largest-magnitude point,
    then repeatedly append the point maximising the product of
    distances to those already chosen (log-domain for robustness).
    The ordering that keeps the scaled-Newton basis well-conditioned
    (Reichel 1990)."""
    vals = np.asarray(vals, np.float64)
    if vals.size == 0:
        return vals
    tiny = np.finfo(np.float64).tiny
    chosen = [int(np.argmax(np.abs(vals)))]
    rest = [j for j in range(vals.size) if j != chosen[0]]
    while rest:
        logs = [
            float(np.sum(np.log(np.abs(vals[j] - vals[chosen]) + tiny)))
            for j in rest
        ]
        k = int(np.argmax(logs))
        chosen.append(rest.pop(k))
    return vals[chosen]


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
    gram=None,  # static callable V (m, n) -> V V^T (m, m); the sharded
    #             path passes a psum-reducing Gram (ONE all-reduce)
    basis_fn=None,  # static callable (tree, p, r) -> the (2s+1, n)
    #             basis stack, replacing the (2s-1)-mat-vec build — the DIA
    #             fused matrix-powers kernel (cgx.ops.dia_powers) plugs
    #             in here
    shifts: Tuple[float, ...] = (),  # Leja-ordered Newton shifts;
    #             empty = Chebyshev basis
    replace_every: int = 0,  # residual replacement cadence in outer
    #             blocks (0 = off): r := b - A x before building the
    #             basis — ONE extra mat-vec per s*replace_every
    #             iterations, ZERO extra reductions (the next Gram
    #             re-derives <r,r>). Guarded van der Vorst-Ye style:
    #             replacement only fires while ||r||^2 > eps*||r_0||^2,
    #             because the EXPLICIT residual has an error floor of
    #             eps*||A||*||x|| — replacing below it injects
    #             out-of-Krylov noise that (measured) drives conj <= 0
    #             and detonates the reference-parity alpha clamp. The
    #             early replacements are the ones that matter: the
    #             deviation's dominant terms accrue while ||x|| updates
    #             are large (vdV-Ye 2000, eq. 2.9).
):
    if gram is None:
        gram = _local_gram
    dtype = b.dtype
    m = 2 * s + 1
    bmat = jnp.asarray(
        _basis_matrix(s, theta, delta, np.float64, shifts), dtype
    )

    def mv(v):
        return matvec(tree, v)

    basis_cols = basis_columns_fn(mv, dtype, theta, delta, shifts)

    # one-time operator preparation (e.g. pre-padded band planes for
    # the matrix-powers kernel) hoisted ABOVE the while loop: XLA will
    # not hoist memory-growing ops out of loop bodies itself
    basis_aux = (
        basis_fn.prepare(tree)
        if basis_fn is not None and hasattr(basis_fn, "prepare")
        else None
    )

    r0 = b - mv(x0)
    rs0 = gram(r0[None, :])[0, 0]
    pre_conv = jnp.logical_or(jnp.sqrt(rs0) < tol, rs0 == 0)

    def cond(state):
        k, blk, x, r, p, rsold, rsnew, conv, brk = state
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_and(jnp.logical_not(conv), jnp.logical_not(brk)),
        )

    rr_floor = jnp.asarray(jnp.finfo(dtype).eps, dtype) * rs0

    def body(state):
        k, blk, x, r, p, rsold, rsnew, conv, brk = state
        if replace_every > 0:
            replace = jnp.logical_and(
                jnp.logical_and(blk > 0, blk % replace_every == 0),
                rsnew > rr_floor,
            )
            # lax.cond (not jnp.where): the mat-vec must only execute
            # in blocks where the replacement actually fires — where
            # would trace both branches and pay it every block
            r = jax.lax.cond(
                replace, lambda x, r: b - mv(x), lambda x, r: r, x, r
            )
        if basis_fn is not None:
            if basis_aux is not None:
                v = basis_fn(tree, p, r, basis_aux)
            else:
                v = basis_fn(tree, p, r)  # (m, n) in one fused pass
        else:
            v = jnp.stack(
                basis_cols(p, s + 1) + basis_cols(r, s), axis=0
            )  # (m, n)
        g = gram(v)  # ONE reduction for the whole block

        xc, d, c, k, rs, rsnew, conv, brk = replay_block(
            g, bmat, s, k, rsnew, conv, brk,
            tol=tol, nearzero=nearzero, maxiter=maxiter,
        )
        # recover the tall vectors (local, no communication): one
        # stacked (3, m) @ (m, n) MXU product — a single pass over V
        # instead of three
        rec = jnp.stack([xc, d, c]) @ v
        x = x + rec[0]
        r = rec[1]
        p = rec[2]
        return (k, blk + 1, x, r, p, rs, rsnew, conv, brk)

    state0 = (
        jnp.asarray(0, jnp.int32),
        jnp.asarray(0, jnp.int32),
        x0,
        r0,
        r0,  # p_0 = r_0
        rs0,
        rs0,
        pre_conv,
        jnp.asarray(False),
    )
    k, blk, x, r, p, rsold, rsnew, conv, brk = jax.lax.while_loop(
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


def _qf_comp(a, g, b):
    """Quadratic form a^T G b with double-f32 accuracy from pure f32:
    Dekker-exact term products + a compensated binary-tree sum
    (error-free transforms are proven for correctly rounded f32, which
    the chip has — results/hw_queue_r3/eft_probe.json). Cost: a few
    vectorized f32 ops on (m, m) — no emulated-fp64 on the critical
    path. In fp64 inputs the plain form is already fine; use it."""
    if g.dtype == jnp.float64:
        return a @ g @ b
    from cgx.ops.tw32 import two_prod32, two_sum32

    q, f = two_prod32(a[:, None], b[None, :])  # outer products, exact
    p1, e1 = two_prod32(g, q)                  # G*q, exact
    p2 = g * f  # |f| <= eps|q|: its own rounding is ~eps^2 of scale
    terms = jnp.concatenate([p1.ravel(), e1.ravel(), p2.ravel()])
    n = terms.shape[0]
    pow2 = 1
    while pow2 < n:
        pow2 *= 2
    s_ = jnp.pad(terms, (0, pow2 - n))
    e_ = jnp.zeros_like(s_)
    while s_.shape[0] > 1:
        s1, e1_ = two_sum32(s_[::2], s_[1::2])
        e_ = e_[::2] + e_[1::2] + e1_
        s_ = s1
    return s_[0] + e_[0]


def replay_block(g, bmat, s: int, k, rsnew, conv, brk, *, tol,
                 nearzero, maxiter: int):
    """Replay s reference-recurrence CG iterations in coefficient
    space from the block Gram matrix ``g`` (step 3 of the s-step
    block; zero communication, zero long-vector traffic).

    Shared by :func:`sstep_cg_loop` and the fused streaming s-step
    solver (cgx.ops.sstep_stream) so the reference break/freeze
    semantics (cg.cc:120-129) live in exactly one place.

    Returns ``(xc, d, c, k, rs, rsnew, conv, brk)``: the recovery
    coefficients of x-update / new residual / new direction in basis
    coordinates, plus the advanced scalar state (``rs`` is the
    block-final rsold).

    The replay's QUADRATIC FORMS (conj = c G c', rr = d G d) cancel ~7
    digits against Gram entries of scale ||b||^2, so evaluating them in
    plain f32 goes noise-negative within a few iterations at large N
    (measured: breakdown at k=3 at N=1e6 fp32,
    results/hw_queue_r3/sstep_envelope.log). They are therefore
    computed COMPENSATED — exact Dekker products + a compensated
    binary-tree sum (:func:`_qf_comp`, ~2^-48 relative to the gross
    term scale) — in pure vectorized f32. An earlier fix promoted the
    whole replay to emulated fp64; correct, but the scalarized 9x9
    emulation cost ~500 us of critical path per block on the chip
    (s=4 at N=4e6: 253.9 -> 411.7 us/iter,
    results/hw_queue_r3/sstep_stream_race2.json). Everything else
    (bmat products, coefficient updates) is cancellation-benign and
    stays in the Gram dtype."""
    dtype = g.dtype
    m = 2 * s + 1
    c = jnp.zeros((m,), dtype).at[0].set(1.0)  # p in basis coords
    d = jnp.zeros((m,), dtype).at[s + 1].set(1.0)  # r in basis coords
    xc = jnp.zeros((m,), dtype)
    rs = _qf_comp(d, g, d)
    for _ in range(s):
        live = jnp.logical_and(
            jnp.logical_and(jnp.logical_not(conv), jnp.logical_not(brk)),
            k < maxiter,
        )
        bc = bmat @ c  # A p_j in basis coords
        conj = _qf_comp(c, g, bc)
        # breakdown FREEZE (vs the core loop's alpha clamp): in
        # coefficient space conj <= 0 means the Gram's noise has
        # swamped the Krylov geometry — the clamped update would be
        # pure noise scaled by 1/nearzero, detonating x (measured NaN
        # at N>=1e6 fp32 on both the fused and the XLA-powers paths,
        # results/hw_queue_r3/sstep_gate_probe.json). Freeze the
        # firing iteration too: the caller gets the LAST GOOD iterate
        # with breakdown=True.
        bad = jnp.logical_and(live, conj <= 0)
        brk = jnp.logical_or(brk, bad)
        active = jnp.logical_and(live, jnp.logical_not(bad))
        alpha = rs / jnp.maximum(conj, rs * nearzero)
        xc_n = xc + alpha * c
        d_n = d - alpha * bc
        rr = _qf_comp(d_n, g, d_n)
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
    return xc, d, c, k, rs, rsnew, conv, brk


def basis_columns_fn(mv, dtype, theta, delta, shifts=()):
    """The s-step basis column builder: [T_0(A)v .. T_{w-1}(A)v] by the
    Chebyshev three-term recurrence on the (theta, delta) interval, or
    the scaled-Newton recurrence N_{i+1} = (A - shifts_i) N_i / sigma
    when Leja shifts are given. Shared by sstep_cg_loop, the sharded
    deep-halo basis (cgx.parallel.sharded_cg._DeepHaloBasis — same
    recurrence over the extended local domain), and the Pallas
    matrix-powers kernel's oracle tests; a stabilization tweak made
    here propagates to every basis-building path at once."""
    th = jnp.asarray(theta, dtype)
    dl = jnp.asarray(delta, dtype)
    sg = jnp.asarray(delta / 2.0, dtype)
    sh = [jnp.asarray(v, dtype) for v in shifts]

    def cols(v0, width: int):
        out = [v0]
        if shifts:
            for i in range(width - 1):
                out.append((mv(out[-1]) - sh[i] * out[-1]) / sg)
            return out
        if width >= 2:
            out.append((mv(v0) - th * v0) / dl)
        for _ in range(2, width):
            t_prev, t_cur = out[-2], out[-1]
            out.append(2.0 * (mv(t_cur) - th * t_cur) / dl - t_prev)
        return out

    return cols


def _local_gram(v):
    return jnp.einsum("mn,kn->mk", v, v, precision=jax.lax.Precision.HIGHEST)


_sstep_jit = partial(
    jax.jit,
    static_argnames=(
        "matvec",
        "s",
        "maxiter",
        "theta",
        "delta",
        "gram",
        "basis_fn",
        "shifts",
        "replace_every",
    ),
)(_f32_exact(sstep_cg_loop))


class _DiaPowersBasis:
    """Hashable basis_fn wrapping the fused DIA matrix-powers kernel."""

    def __init__(self, offsets, s, theta, delta, shifts, rows, cols,
                 interpret):
        self.offsets = tuple(offsets)
        self.s = int(s)
        self.theta = float(theta)
        self.delta = float(delta)
        self.shifts = tuple(shifts)
        self.rows = int(rows)
        self.cols = int(cols)
        self.interpret = bool(interpret)

    def prepare(self, tree):
        """Pre-padded band planes, built ONCE per solve (hoisted above
        the while loop by sstep_cg_loop — XLA does not hoist the
        memory-growing pad itself, and the per-block re-pad costs
        2*ndiag*N extra words; scripts/bw_control3.py)."""
        from cgx.ops.dia_powers import sstep_powers_band_planes

        return sstep_powers_band_planes(
            tree.bands, offsets=self.offsets, s=self.s,
            rows=self.rows, cols=self.cols,
        )

    def __call__(self, tree, p, r, aux=None):
        from cgx.ops.dia_powers import (
            dia_sstep_basis, dia_sstep_basis_planes,
        )

        if aux is not None:
            return dia_sstep_basis_planes(
                aux, p, r,
                offsets=self.offsets, s=self.s, theta=self.theta,
                delta=self.delta, shifts=self.shifts, rows=self.rows,
                cols=self.cols, interpret=self.interpret,
            )
        return dia_sstep_basis(
            tree.bands, p, r,
            offsets=self.offsets, s=self.s, theta=self.theta,
            delta=self.delta, shifts=self.shifts, rows=self.rows,
            cols=self.cols, interpret=self.interpret,
        )

    def _key(self):
        return (
            type(self), self.offsets, self.s, self.theta, self.delta,
            self.shifts, self.rows, self.cols, self.interpret,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


def newton_shifts(
    a, n: int, s: int, bounds: Tuple[float, float]
) -> Tuple[float, ...]:
    """s Leja-ordered Ritz values for the scaled-Newton s-step basis.

    Runs ``max(2s, 16)`` Lanczos steps (host orchestration, full
    reorthogonalization — cgx.solver.chebyshev.lanczos_tridiag), takes
    the eigenvalues of the tridiagonal, thins them to s points spread
    over the Ritz range, and Leja-orders. Falls back to Chebyshev
    points of the ``bounds`` interval if Lanczos terminates early."""
    from cgx.solver.chebyshev import host_matvec, lanczos_tridiag

    m = min(max(2 * s, 16), n)
    try:
        _, alphas, betas, _ = lanczos_tridiag(host_matvec(a), n, m)
        t = np.diag(alphas)
        if len(alphas) > 1:
            t += np.diag(betas, 1) + np.diag(betas, -1)
        ritz = np.linalg.eigvalsh(t)
    except Exception:  # noqa: BLE001 — shifts are best-effort
        ritz = np.zeros((0,))
    if ritz.size >= s:
        # thin to s values spread across the Ritz spectrum
        idx = np.round(np.linspace(0, ritz.size - 1, s)).astype(int)
        pts = ritz[idx]
    else:
        # Chebyshev points of the bounds interval
        lmin, lmax = bounds
        th = (lmax + lmin) / 2.0
        dl = (lmax - lmin) / 2.0
        j = np.arange(s)
        pts = th + dl * np.cos((2 * j + 1) * np.pi / (2 * s))
    return tuple(float(v) for v in leja_order(pts))


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
    basis: str = "chebyshev",
    replace_every: Optional[int] = None,
    powers: str = "off",
    powers_block: Tuple[int, int] = (512, 512),
    fallback: str = "auto",
) -> CGResult:
    """Solve SPD ``A x = b`` by s-step CG (one reduction per s
    iterations; classic-CG iterates in exact arithmetic).

    Args:
      s: block size (iterations per reduction). fp64 handles s <= ~8
        on Laplacian-like spectra with the defaults; for s > 8 enable
        ``replace_every=1`` (and optionally ``basis='newton'``) to pin
        the recursive residual to the true one.
      bounds: (lmin, lmax) for the basis interval; estimated via
        :func:`cgx.solver.chebyshev.spectral_bounds` when omitted.
      basis: 'chebyshev' (three-term recurrence on the spectral
        interval) or 'newton' (scaled-Newton with s Leja-ordered Ritz
        shifts from a short Lanczos run — :func:`newton_shifts`).
      replace_every: residual-replacement cadence in outer blocks
        (0 = off). Each replacement recomputes ``r = b - A x``
        explicitly before building the next basis: ONE extra mat-vec
        per ``s * replace_every`` iterations, zero extra reductions.
        ``None`` (default) resolves to 0 for ``s <= 8`` (preserving
        the classic trajectory / mat-vec count) and 1 for larger s,
        where fp64 needs the replacement to stay stable.
      powers: 'off' (default — basis built from 2s-1 separate mat-vecs),
        'pallas' (banded operators, fp32/bf16: build the whole basis
        with the fused matrix-powers kernel, cgx.ops.dia_powers — ONE
        HBM pass over the bands per s iterations instead of 2s-1),
        'interpret' (same kernel in interpreter mode, for CPU tests),
        or 'fused' (banded fp32/bf16: the fully fused two-kernel
        streaming block, cgx.ops.sstep_stream — the basis never
        touches HBM; (2*ndiag+8)N words per s iterations; interpret
        mode is picked automatically on the CPU backend).
      powers_block: (rows, cols) VMEM tile of the powers kernel.
      fallback: 'auto' (default) or 'off'. s-step's Krylov-block basis
        is numerically RANK-DEFICIENT when the residual's spectral
        content collapses onto a tight eigenvalue cluster — e.g. the
        reference source term at N~1e7, whose energy sits at
        lambda ~ 2e-6 so all basis vectors are nearly parallel
        (measured f64 Gram spectrum 6.2, 1e-3, 1e-4, 2e-6, then noise;
        Newton shifts do not help — same block-2 breakdown). The
        replay detects this and FREEZES at a valid early iterate;
        with 'auto' the solve then restarts gracefully from the
        frozen x on the plain solver (streaming kernel for banded
        fp32/bf16 via the exact shift identity, classic CG
        otherwise), so the combined solve is never worse than the
        plain method minus one wasted block. Indefinite operators
        still surface ``breakdown=True`` from the fallback itself.
        'adaptive' keeps the s-step economics through a breakdown:
        restart from the frozen iterate at s//2 (recursively down to
        s=2) before ever touching the plain solver — each rung keeps
        the one-reduction-per-s-iterations (and, with
        powers='fused', the fused-block traffic) advantage at a
        quadratically milder basis-conditioning requirement. Costs
        one extra kernel compile per rung actually taken.
    """
    if fallback not in ("auto", "adaptive", "off"):
        raise ValueError(f"unknown fallback {fallback!r}")
    if replace_every is None:
        replace_every = 1 if int(s) > 8 else 0
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
    if basis == "newton":
        shifts = newton_shifts(a, n, int(s), (lmin, lmax))
    elif basis == "chebyshev":
        shifts = ()
    else:
        raise ValueError(f"unknown s-step basis {basis!r}")
    if powers not in ("off", "pallas", "interpret", "fused"):
        raise ValueError(f"unknown powers mode {powers!r}")
    if powers == "fused":
        import jax as _jax

        from cgx.ops.sstep_stream import dia_sstep_stream_solve
        from cgx.solver.operators import DiaOperator

        if not isinstance(a, DiaOperator):
            raise TypeError("powers='fused' needs a banded DiaOperator")
        if replace_every:
            raise ValueError(
                "powers='fused' does not support residual replacement "
                "(the fused block never materializes r explicitly)"
            )
        res = dia_sstep_stream_solve(
            a, b, x0, s=int(s), bounds=(lmin, lmax), tol=tol,
            maxiter=maxiter, nearzero=nearzero, basis=basis,
            rows=int(powers_block[0]), cols=int(powers_block[1]),
            interpret=_jax.default_backend() == "cpu",
        )
        return _sstep_fallback(
            a, b, res, tol=tol, maxiter=maxiter, nearzero=nearzero,
            fallback=fallback, s=int(s), bounds=(lmin, lmax),
            basis=basis, powers=powers, powers_block=powers_block,
        )
    basis_fn = None
    if powers != "off":
        from cgx.solver.operators import DiaOperator

        if not isinstance(a, DiaOperator):
            raise TypeError(
                "powers='pallas' needs a banded DiaOperator, got "
                f"{type(a).__name__}"
            )
        if powers == "pallas" and a.dtype == jnp.float64:
            raise TypeError(
                "the Pallas matrix-powers kernel has no fp64 TPU "
                "lowering; use powers='off' for fp64 (or 'interpret' "
                "for CPU testing)"
            )
        basis_fn = _DiaPowersBasis(
            a.offsets, int(s), theta, delta, shifts,
            powers_block[0], powers_block[1], powers == "interpret",
        )
    # Exact power-of-2 RHS prescale (cgx.ops._util.pow2_rhs_scale):
    # the replay's products of Gram entries overflow f32 for huge-norm
    # b (the reference source term at N~1e7); bitwise no-op otherwise.
    from cgx.ops._util import pow2_rhs_scale

    down, up = pow2_rhs_scale(b, x0)
    res = _sstep_jit(
        a,
        b * down,
        x0 * down,
        jnp.asarray(tol, b.dtype) * down,
        jnp.asarray(nearzero, b.dtype),
        matvec=_call,
        s=int(s),
        maxiter=int(maxiter),
        theta=theta,
        delta=delta,
        shifts=shifts,
        basis_fn=basis_fn,
        replace_every=int(replace_every),
    )
    res = res._replace(
        x=res.x * up,
        residual_norm=res.residual_norm * up,
        rsold=res.rsold * (up * up),
    )
    return _sstep_fallback(
        a, b, res, tol=tol, maxiter=maxiter, nearzero=nearzero,
        fallback=fallback, s=int(s), bounds=(lmin, lmax), basis=basis,
        powers=powers, powers_block=powers_block,
    )


def _sstep_fallback(a, b, res, *, tol, maxiter, nearzero, fallback,
                    s=0, bounds=None, basis="chebyshev", powers="off",
                    powers_block=(512, 512)):
    """Graceful restart after a replay breakdown (basis rank collapse —
    see the ``fallback`` arg of :func:`sstep_cg_solve`): continue from
    the frozen (valid) iterate on the plain solver for the remaining
    iteration budget. Banded fp32/bf16 operators restart on the
    streaming kernel via the exact shift identity (it assumes a zero
    start); everything else warm-starts classic CG directly.

    ``fallback='adaptive'`` (r4 VERDICT item 8) first walks the
    s-LADDER instead of abandoning the s-step economics: restart
    s-step from the frozen iterate at s//2 (recursively, down to
    s=2), and only when s=2 ALSO collapses drop to the plain solver.
    Each rung keeps the block's traffic/reduction advantage at a
    milder basis-conditioning requirement (kappa of the degree-(s-1)
    Krylov basis shrinks geometrically with s). The rank collapse is
    detected by the replay itself — the freeze already bounds the
    waste to one s-block — so no separate Gram-condition monitor runs
    ahead of it."""
    if fallback == "off" or not bool(res.breakdown) or bool(res.converged):
        return res
    used = int(res.iterations)
    left = int(maxiter) - used
    if left <= 0:
        return res
    if fallback == "adaptive" and int(s) >= 4:
        res2 = sstep_cg_solve(
            a, b, res.x, s=int(s) // 2, bounds=bounds, tol=tol,
            maxiter=left, nearzero=nearzero, basis=basis,
            powers=powers, powers_block=powers_block,
            fallback="adaptive",
        )
        return res2._replace(iterations=res2.iterations + used)
    from cgx.solver.operators import DiaOperator

    x_f = res.x
    if isinstance(a, DiaOperator) and a.dtype != jnp.float64:
        import jax as _jax

        from cgx.ops.cg_stream import dia_cg_solve_stream

        r_f = b - a.matvec(x_f)
        fres = dia_cg_solve_stream(
            a, r_f, tol=tol, maxiter=left, nearzero=nearzero,
            interpret=_jax.default_backend() == "cpu",
            bands_dtype="auto",
        )
        fres = fres._replace(x=x_f + fres.x)
    else:
        from cgx.solver.cg import cg_solve

        fres = cg_solve(
            a, b, x_f, tol=tol, maxiter=left, nearzero=nearzero
        )
    return fres._replace(iterations=fres.iterations + used)


def _call(tree, v):
    return tree.matvec(v)
