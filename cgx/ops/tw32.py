"""Triple-word float32 arithmetic: beyond-fp64 accuracy from native f32.

Why this exists — a measured hardware fact (results/hw_queue_r3/
eft_probe): on this TPU the emulated fp64 is NOT correctly rounded
(10.5% of adds bit-match IEEE binary64; errors reach 2074 ulp under
cancellation). Dekker/Knuth error-free transforms are only proven for
correctly rounded arithmetic, so the fp64 double-double machinery in
:mod:`cgx.ops.dd` silently degrades to ~fp64 on device — the round-3
probe measured its refinement stalling at 3.4e-10 true relative
residual at N=4e6, the emulated-fp64 evaluation floor, instead of
converging below the 1e-10 gate (results/hw_queue_r3/fp64q_g2000_dd).

float32, by contrast, is the chip's NATIVE VPU arithmetic (IEEE
round-to-nearest — device-verified by the same probe). So the
TPU-native route to beyond-fp64 accuracy is to build it from f32:
carry values as an unevaluated triple of f32 words (~71 mantissa bits,
eps ~ 4e-22 — beyond even true IEEE fp64) and use f32 error-free
transforms, which ARE exact here. All operations are elementwise f32
VPU chains — no emulated-fp64 ops anywhere in the hot path, so a
triple-word banded mat-vec is also ~an order of magnitude cheaper than
the chip's own emulated-fp64 mat-vec.

Used by :func:`cgx.solver.refine.refine_pcg_sweeps_tw` — the large-N
fp64-QUALITY flagship path (reference quality gate: the recomputed
true relative residual of /root/reference/code/MPI/cg.cc:144-154).

Word convention: a triple (w0, w1, w2) of f32 arrays with
|w0| >= |w1| >= |w2| and adjacent words non-overlapping after
renormalization (Shewchuk expansions, fixed length 3).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_F32 = jnp.float32
_SPLIT32 = np.float32(4097.0)  # 2**12 + 1 — Dekker splitter for binary32


def two_sum32(a, b):
    """Exact a + b = s + e (Knuth; requires round-to-nearest f32)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum32(a, b):
    """Exact a + b = s + e, REQUIRES |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_prod32(a, b):
    """Exact a * b = p + e (Dekker split; exact without FMA)."""
    p = a * b
    ta = _SPLIT32 * a
    a_hi = ta - (ta - a)
    a_lo = a - a_hi
    tb = _SPLIT32 * b
    b_hi = tb - (tb - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def tw_renorm(c0, c1, c2):
    """Renormalize three (roughly ordered) terms into a canonical
    non-overlapping triple (VecSum cascade, Ogita-Rump-Oishi)."""
    s, e2 = two_sum32(c1, c2)
    w0, e1 = two_sum32(c0, s)
    w1, w2 = two_sum32(e1, e2)
    return w0, w1, w2


def tw_zero_like(v):
    z = jnp.zeros_like(v, dtype=_F32)
    return (z, jnp.zeros_like(z), jnp.zeros_like(z))


def tw_add_f32(x: Tuple, v) -> Tuple:
    """Triple + plain f32, renormalized (cascaded two_sum)."""
    s0, e0 = two_sum32(x[0], v)
    s1, e1 = two_sum32(x[1], e0)
    s2 = x[2] + e1
    return tw_renorm(s0, s1, s2)

def tw_add_tw(x: Tuple, y: Tuple) -> Tuple:
    """Triple + triple, renormalized.

    Cascade both words-lists through two_sum; the discarded term is
    O(eps^3) of the leading word (documented error floor; the canonical
    Shewchuk merge would keep 6 exact words we don't need)."""
    s0, e0 = two_sum32(x[0], y[0])
    s1, e1 = two_sum32(x[1], y[1])
    t1, f1 = two_sum32(s1, e0)
    s2 = (x[2] + y[2]) + (e1 + f1)
    return tw_renorm(s0, t1, s2)


def tw_neg(x: Tuple) -> Tuple:
    return (-x[0], -x[1], -x[2])


def tw_scale_f32(x: Tuple, a) -> Tuple:
    """Triple * plain f32 scalar/array, renormalized."""
    p0, q0 = two_prod32(x[0], a)
    p1, q1 = two_prod32(x[1], a)
    # x2*a: plain product; its rounding error is O(eps^3) of the result
    t1, f1 = two_sum32(p1, q0)
    p2 = x[2] * a + (q1 + f1)
    return tw_renorm(p0, t1, p2)


def tw_from_f64(x64) -> Tuple:
    """Split an fp64 device array into an exact f32 triple.

    53 mantissa bits always fit in three 24-bit words, so on an IEEE
    backend the split is exact. On this TPU fp64 is itself an f32-pair
    emulation (see module docstring), so the subtractions below are
    exact *in the emulated arithmetic* and the triple reproduces the
    stored value; tests verify the round-trip on both backends.
    """
    w0 = x64.astype(_F32)
    r = x64 - w0.astype(x64.dtype)
    w1 = r.astype(_F32)
    r = r - w1.astype(x64.dtype)
    w2 = r.astype(_F32)
    return (w0, w1, w2)


def tw_to_f64(x: Tuple, dtype=jnp.float64):
    """Evaluate the triple in fp64 (for norms/diagnostics only — on the
    TPU the result inherits the emulation's ~2^-48 accuracy)."""
    return (
        x[0].astype(dtype) + x[1].astype(dtype) + x[2].astype(dtype)
    )


def _shift32(v, off: int):
    """shift(x, off)[i] = x[i + off], zero fill (the banded_matvec
    alignment convention, cgx.solver.operators)."""
    if off == 0:
        return v
    if off > 0:
        return jnp.pad(v[off:], (0, off))
    return jnp.pad(v[:off], (-off, 0))


def split_bands_tw(bands64):
    """EXACT 3-word f32 split of an f64 band array: returns a
    (3, ndiag, n) f32 stack with ``c0 + c1 + c2 == bands64`` bitwise
    (24*3 = 72 >= 53 mantissa bits; each residual subtraction cancels
    exactly). Feed the stack to :func:`banded_matvec_tw` /
    :func:`residual_tw` so the tw outer treats the TRUE f64 operator —
    required when the bands are not f32-representable (round-4 item 6:
    poisson2d_var's harmonic-mean coefficients; lap2d's integer stencil
    never needs this)."""
    b64 = jnp.asarray(bands64, jnp.float64)
    c0 = b64.astype(jnp.float32)
    r1 = b64 - c0.astype(jnp.float64)
    c1 = r1.astype(jnp.float32)
    c2 = (r1 - c1.astype(jnp.float64)).astype(jnp.float32)
    return jnp.stack([c0, c1, c2])


def bands_f32_exact(bands64) -> bool:
    """True when the f64 bands roundtrip f32 bit-exactly (the single-
    plane tw path then treats the true operator)."""
    import numpy as np

    b = np.asarray(bands64)
    return bool(np.all(b.astype(np.float32).astype(b.dtype) == b))


@partial(jax.jit, static_argnames=("offsets",))
def banded_matvec_tw(bands32, offsets, x: Tuple) -> Tuple:
    """y = A (x0 + x1 + x2) in triple-word f32.

    ``bands32`` is the (ndiag, n) f32 band array (DIA layout) — the
    operator is then the f32-ROUNDED bands (exact for integer stencils
    like lap2d) — or a (3, ndiag, n) f32 stack from
    :func:`split_bands_tw`, in which case the product chain carries the
    full f64 operator to ~2^-71 relative. Band products enter through
    two_prod32 (exact), accumulation through the cascaded triple adds.
    Pure elementwise f32 VPU chains — no emulated-fp64 anywhere.
    """
    planes = bands32.ndim == 3
    acc = None
    for d, off in enumerate(offsets):
        t0 = _shift32(x[0], off)
        t1 = _shift32(x[1], off)
        t2 = _shift32(x[2], off)
        if planes:
            c0, c1, c2 = bands32[0, d], bands32[1, d], bands32[2, d]
            p00, q00 = two_prod32(c0, t0)
            p01, q01 = two_prod32(c0, t1)
            p10, q10 = two_prod32(c1, t0)
            # all ~eps^2-relative terms: plain f32 adds suffice
            lo = c0 * t2 + c1 * t1 + c2 * t0 + q01 + q10
            s1, e1 = two_sum32(p01, q00)
            s2, e2 = two_sum32(s1, p10)
            term = tw_renorm(p00, s2, lo + e1 + e2)
        else:
            bd = bands32[d]
            p0, q0 = two_prod32(bd, t0)
            p1, q1 = two_prod32(bd, t1)
            p2 = bd * t2 + q1
            s1, e1 = two_sum32(p1, q0)
            term = tw_renorm(p0, s1, p2 + e1)
        if acc is None:
            acc = term
        else:
            acc = tw_add_tw(acc, term)
    return acc


@partial(jax.jit, static_argnames=("offsets",))
def residual_tw(bands32, offsets, b: Tuple, x: Tuple):
    """r = b - A x as an f32 triple, plus ||r|| (fp64 norm of the
    evaluated triple — the norm itself only needs a few digits)."""
    ax = banded_matvec_tw(bands32, offsets, x)
    r = tw_add_tw(b, tw_neg(ax))
    rv = r[0].astype(jnp.float64) + r[1].astype(jnp.float64)
    r_norm = jnp.sqrt(jnp.sum(rv * rv))
    return r, r_norm


# ---------------------------------------------------------------------------
# Compensated block contractions (round-4 VERDICT item 5: the blockcg
# Gram/pinv path ran in plain f32 and its cancellation noise degraded
# the block Krylov space — same failure class as the s-step replay,
# fixed there by _qf_comp-style compensation)
# ---------------------------------------------------------------------------


def _comp_tree_sum32(s_, e_):
    """Compensated binary-tree reduction over axis 0 of (s_, e_) value/
    error pairs; returns scalar-axis-collapsed (hi, lo)."""
    n = s_.shape[0]
    pow2 = 1
    while pow2 < n:
        pow2 *= 2
    if pow2 != n:
        pad = [(0, pow2 - n)] + [(0, 0)] * (s_.ndim - 1)
        s_ = jnp.pad(s_, pad)
        e_ = jnp.pad(e_, pad)
    while s_.shape[0] > 1:
        s1, e1 = two_sum32(s_[::2], s_[1::2])
        e_ = e_[::2] + e_[1::2] + e1
        s_ = s1
    return s_[0], e_[0]


def comp_block_gram(a, b, chunk: int = 512):
    """``A^T B`` over a long first axis with cross-chunk compensation.

    Per-chunk contractions ride the MXU in plain f32 (HIGHEST); the
    cross-chunk combination — where block CG's Gram entries actually
    cancel — is a compensated f32 tree (exact, two_sum32). Error is
    bounded by the per-chunk accumulation (~sqrt(chunk)*eps of chunk
    scale) independent of n, instead of growing with the full
    reduction length. fp64 inputs use the plain einsum (already exact
    enough, and EFTs are invalid in this chip's emulated fp64 —
    module docstring)."""
    if a.dtype != _F32 or b.dtype != _F32:
        return jnp.einsum(
            "ns,nt->st", a, b, precision=jax.lax.Precision.HIGHEST
        )
    n, ma = a.shape
    mb = b.shape[1]
    nc = -(-n // chunk)
    if nc <= 1:
        return jnp.einsum(
            "ns,nt->st", a, b, precision=jax.lax.Precision.HIGHEST
        )
    n_p = nc * chunk
    if n_p != n:
        a = jnp.pad(a, ((0, n_p - n), (0, 0)))
        b = jnp.pad(b, ((0, n_p - n), (0, 0)))
    part = jnp.einsum(
        "cns,cnt->cst",
        a.reshape(nc, chunk, ma),
        b.reshape(nc, chunk, mb),
        precision=jax.lax.Precision.HIGHEST,
    )
    hi, lo = _comp_tree_sum32(part, jnp.zeros_like(part))
    return hi + lo


def comp_small_matmul(a, b):
    """``A @ B`` for small f32 matrices as an unevaluated (hi, lo)
    pair: Dekker-exact term products + compensated tree sum over the
    contraction axis. Used for iterative refinement residuals and
    Gram sandwiches where plain f32 loses the digits that matter."""
    p, e = two_prod32(a[:, :, None], b[None, :, :])  # (m, k, t)
    # reduce over the contraction axis (1): move it to front
    hi, lo = _comp_tree_sum32(
        jnp.moveaxis(p, 1, 0), jnp.moveaxis(e, 1, 0)
    )
    return hi, lo
