"""Double-double (compensated) arithmetic for beyond-fp64 residuals.

Why this exists: the reference's quality gate is the recomputed true
relative residual ``||Ax-b||/||b||`` (cg.cc:144-154), and its printed
values (~1e-12) sit comfortably above the fp64 evaluation floor at its
sizes (N <= 16384, condition ~8e3). At the large-N flagship sizes the
floor moves: evaluating ``b - A x`` in fp64 carries rounding
~eps * (|A||x| + |b|) per component, and for the 2-D Laplacian
``||x|| ~ ||b|| * O(kappa)``, so the smallest OBSERVABLE relative
residual grows like eps * kappa — at N=4e6 (kappa ~ 1.6e6) that is
~1e-9: no pure-fp64 solver, the reference's included, can print
< 1e-10 there. Measured: the round-3 probe's fp64 MG-PCG stalls at
2.3e-9 true rel residual at N=4e6 while its recursive residual reaches
3e-11 (results/hw_queue_r3/).

The fix is classical (Wilkinson refinement to working precision):
carry the solution as an unevaluated pair ``x = x_hi + x_lo`` of fp64
vectors and compute residuals with error-free transformations, so the
evaluation floor drops to ~eps^2 and refinement can push the TRUE
residual of the pair below 1e-10 at any N. Only the outer sweeps pay
the extended-precision cost (a handful of dd band mat-vecs); the heavy
lifting stays in the fp32 inner solver.

HARDWARE CAVEAT (measured, results/hw_queue_r3/eft_probe.json): the
EFT exactness proofs require correctly rounded binary64 + and *. On
this TPU the emulated fp64 is NOT correctly rounded (10.5% of adds
bit-match IEEE; errors reach 2074 ulp under cancellation), so on the
TPU backend this module silently degrades to ~fp64 accuracy — the
round-3 probe measured refine_pcg_sweeps_dd stalling at 3.4e-10 at
N=4e6 instead of converging (results/hw_queue_r3/fp64q_g2000_dd).
float32 IS correctly rounded there, so the TPU-native path is
:mod:`cgx.ops.tw32` (triple-word f32, ~2^-71) and
:func:`cgx.solver.refine.refine_pcg_sweeps_tw`. This module stays
correct on IEEE backends (CPU; CI-verified against longdouble).

Primitives (Dekker/Knuth, TPU-friendly: pure elementwise VPU chains,
no data-dependent control flow):

- two_sum(a, b)      exact a + b = s + e            (6 flops)
- two_prod(a, b)     exact a * b = p + e            (Dekker split, 17
                     flops; exact without FMA)
- dd arithmetic      add/scale on (hi, lo) pairs, renormalized

The banded mat-vec accumulates all ndiag products of BOTH words in dd,
so for stencils with power-of-two coefficients (lap2d/lap3d: -1, 4, 6
= 4+2) the products are exact even before the error term — the
general two_prod path is kept so arbitrary band values stay correct.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_SPLITTER = 134217729.0  # 2**27 + 1 (Dekker splitting constant, fp64)


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    t = _SPLITTER * a
    hi = t - (t - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free transform: a * b = p + e exactly (Dekker, no FMA)."""
    p = a * b
    a_hi, a_lo = _split(a)
    b_hi, b_lo = _split(b)
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def dd_add(x: Tuple, y: Tuple) -> Tuple:
    """(hi, lo) + (hi, lo), renormalized."""
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return fast_two_sum(s, e)


def dd_add_fp(x: Tuple, a) -> Tuple:
    """(hi, lo) + plain fp64 a, renormalized."""
    s, e = two_sum(x[0], a)
    return fast_two_sum(s, e + x[1])


def dd_neg(x: Tuple) -> Tuple:
    return (-x[0], -x[1])


def dd_scale_fp(x: Tuple, a) -> Tuple:
    """(hi, lo) * plain fp64 a (a treated as exact)."""
    p, e = two_prod(x[0], a)
    return fast_two_sum(p, e + x[1] * a)


def dd_from_fp(a) -> Tuple:
    return (a, jnp.zeros_like(a))


def _shift(v, off: int, n: int):
    """shift(x, off)[i] = x[i + off] with zero fill (matches
    cgx.solver.operators.banded_matvec's alignment convention)."""
    if off == 0:
        return v
    if off > 0:
        return jnp.pad(v[off:], (0, off))
    return jnp.pad(v[:off], (-off, 0))


@partial(jax.jit, static_argnames=("offsets",))
def banded_matvec_dd(bands, offsets, x_hi, x_lo):
    """y = A (x_hi + x_lo) in double-double: every band product enters
    through two_prod and every accumulation through dd_add, so the
    result pair carries the mat-vec to ~eps^2."""
    n = x_hi.shape[0]
    acc = None
    for d, off in enumerate(offsets):
        sh = _shift(x_hi, off, n)
        sl = _shift(x_lo, off, n)
        p, e = two_prod(bands[d], sh)
        term = fast_two_sum(p, e + bands[d] * sl)
        acc = term if acc is None else dd_add(acc, term)
    return acc


@partial(jax.jit, static_argnames=("offsets",))
def residual_dd(bands, offsets, b, x_hi, x_lo):
    """r = b - A x as a dd pair, plus ||r|| and ||b|| (fp64 norms of
    the hi words — far below the eps^2 pair accuracy)."""
    ax = banded_matvec_dd(bands, offsets, x_hi, x_lo)
    r = dd_add(dd_neg(ax), dd_from_fp(b))
    r_norm = jnp.sqrt(jnp.sum(r[0] * r[0]))
    return r, r_norm


def dd_norm(x_hi, x_lo):
    """||x_hi + x_lo|| to fp64 accuracy (hi-word dominated)."""
    return jnp.sqrt(jnp.sum((x_hi + x_lo) ** 2))
