"""Ozaki-style split-precision dense fp64 mat-vec on the MXU.

The reference's regime is dense fp64 CG (MPI cg.cc:80-101 runs
cblas_dgemv on fp64; CUDA cg.cu:14-110 likewise). On TPU fp64 matmuls
are software-emulated and run at ~1.7% of peak (BENCHMARKS.md dense
table: 58.4 ms/mat-vec at N=1e4 vs 0.578 ms for fp32). This module
recovers fp64-*quality* dense mat-vecs from pure bf16 MXU passes using
the Ozaki splitting scheme (Ozaki et al., "Error-free transformations
of matrix multiplication", Numer. Algorithms 2012; the same idea
underlies fp64 emulation on NVIDIA tensor cores):

  1. Scale each row of A by a power of two so |A_hat| <= 1, then slice
     the mantissa into S slices of beta=8 bits each. Every slice entry
     is an INTEGER multiple of a power of two with magnitude <= 2^8 —
     exactly representable in bfloat16.
  2. Scale x per column-block (k=256 columns) by a power of two and
     slice identically.
  3. A bf16 x bf16 product of two such slices is an integer < 2^16,
     exact in the MXU's fp32 accumulator; a <=256-term accumulation of
     such products stays < 2^24 — STILL EXACT in fp32. So every
     per-block partial dot P[s,t,i,b] is computed without a single
     rounding error.
  4. The cross-block / cross-slice combination sum — O(n * n/k) terms,
     not O(n^2) — runs in fp64 on the VPU.

Total error is only the dropped slice tails: ~2^(-S*beta) relative to
the absolute-value mass of the dot, i.e. ~1e-16 for the default S=7 —
at or below genuine fp64 mat-vec roundoff (which itself carries a
~n*2^-53 accumulation bound). Traffic is S bf16 copies of A
(7 x 2 bytes = 14 bytes/entry vs 8 for fp64), all read at HBM speed:
~40x faster than the emulated fp64 path at N=1e4.

Exactness invariants (asserted in tests/test_ozaki.py):
  - beta * 2 + log2(block) <= 24  (fp32 accumulator never rounds)
  - slice magnitudes: |C_0| <= 2^beta, |C_s| <= 2^(beta-1) for s >= 1
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

BETA = 8  # mantissa bits per slice (integers <= 2^8: bf16-exact)
BLOCK = 256  # contraction block: 2*BETA + log2(BLOCK) = 24 = fp32 mantissa


def _pow2_ceil(v: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two >= v (elementwise, v > 0 assumed where it
    matters; zeros map to 1.0). Power-of-two scaling keeps the
    subsequent divisions exact. NOTE: built via ldexp with an integer
    exponent — jnp.exp2 lowers to exp(x*ln2) on some backends and
    returns 255.999...94 for exp2(8.0), which would silently break the
    exact-division property."""
    safe = jnp.where(v > 0, v, 1.0)
    e = jnp.ceil(jnp.log2(safe)).astype(jnp.int32)
    p = jnp.ldexp(jnp.ones_like(safe), e)
    # guard log2 rounding at exact-power boundaries
    p = jnp.where(p < safe, p * 2.0, p)
    return jnp.where(v > 0, p, 1.0)


def _slice_mantissa(r: jnp.ndarray, num_slices: int, out_dtype):
    """Split |r| <= 1 into integer-valued slices of BETA bits.

    Returns a list of ``num_slices`` arrays in ``out_dtype`` whose
    values are integers with |C_s| <= 2^BETA, such that
    r ~= sum_s C_s * 2^(-(s+1)*BETA) with remainder < 2^(-S*BETA-1).
    """
    slices = []
    for s in range(num_slices):
        scale = 2.0 ** ((s + 1) * BETA)  # exact Python-float constant
        c = jnp.round(r * scale)
        slices.append(c.astype(out_dtype))
        r = r - c / scale
    return slices


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _build_slices(a: jnp.ndarray, num_slices: int):
    n, m = a.shape
    nb = -(-m // BLOCK)
    pad = nb * BLOCK - m
    row_max = jnp.max(jnp.abs(a), axis=1)
    sigma = _pow2_ceil(row_max)
    a_hat = a / sigma[:, None]
    if pad:
        a_hat = jnp.pad(a_hat, ((0, 0), (0, pad)))
    parts = _slice_mantissa(a_hat, num_slices, jnp.bfloat16)
    c = jnp.stack(parts).reshape(num_slices, n, nb, BLOCK)
    return c, sigma


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _slice_vector(x: jnp.ndarray, num_slices: int):
    (m,) = x.shape
    nb = -(-m // BLOCK)
    pad = nb * BLOCK - m
    if pad:
        x = jnp.pad(x, (0, pad))
    xb = x.reshape(nb, BLOCK)
    tau = _pow2_ceil(jnp.max(jnp.abs(xb), axis=1))
    x_hat = xb / tau[:, None]
    parts = _slice_mantissa(x_hat, num_slices, jnp.bfloat16)
    return jnp.stack(parts), tau  # (S, nb, BLOCK), (nb,)


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _ozaki_apply(c, sigma, x, *, num_slices: int):
    f64 = sigma.dtype
    d, tau = _slice_vector(x.astype(f64), num_slices)
    s_tot = num_slices
    n = c.shape[1]
    nb = c.shape[2]
    y_nb = jnp.zeros((n, nb), f64)
    for s in range(s_tot):
        t_count = s_tot - s  # keep pairs with s + t <= S-1
        # exact bf16 products, exact <=256-term fp32 accumulation
        p = jnp.einsum(
            "nbk,tbk->tnb",
            c[s],
            d[:t_count],
            preferred_element_type=jnp.float32,
        )
        w = jnp.asarray(
            [2.0 ** (-(t + s + 2) * BETA) for t in range(t_count)], f64
        )
        y_nb = y_nb + jnp.einsum("tnb,t->nb", p.astype(f64), w)
    y = sigma * jnp.einsum("nb,b->n", y_nb, tau)
    return y


@jax.tree_util.register_pytree_node_class
class OzakiDenseOperator:
    """Dense fp64-quality operator from bf16 slices (MXU speed).

    Drop-in for the fp64 ``DenseOperator`` in CG / refinement: the
    mat-vec error is ~2^(-S*8) of the dot's absolute mass — below the
    inherent fp64 accumulation roundoff for the default S=7 — while
    every FLOP runs on the MXU in bf16. Reference regime: the dense
    dgemv of cg.cc:101 / the MatVecT kernel of cg.cu:63-110.
    """

    def __init__(self, c, sigma, diag, num_slices: int):
        self.c = c  # (S, n, nb, BLOCK) bf16 integer-valued slices
        self.sigma = sigma  # (n,) fp64 per-row power-of-two scale
        self._diag = diag  # (n,) fp64
        self.num_slices = num_slices

    @classmethod
    def from_dense(cls, a: jnp.ndarray, num_slices: int = 7):
        if a.dtype != jnp.float64:
            a = a.astype(jnp.float64)
        c, sigma = _build_slices(a, num_slices)
        return cls(c, sigma, jnp.diagonal(a), num_slices)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.c.shape[1], self.c.shape[1])

    @property
    def dtype(self):
        return self.sigma.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return _ozaki_apply(
            self.c, self.sigma, x, num_slices=self.num_slices
        ).astype(x.dtype)

    def diagonal(self) -> jnp.ndarray:
        return self._diag

    def tree_flatten(self):
        return (self.c, self.sigma, self._diag), self.num_slices

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)


def ozaki_matvec(
    a: jnp.ndarray, x: jnp.ndarray, *, num_slices: int = 7
) -> jnp.ndarray:
    """One-shot fp64-quality y = A @ x via the Ozaki splitting.

    Slices A on every call — use :class:`OzakiDenseOperator` to amortize
    the O(S n^2) slicing across many mat-vecs (e.g. inside CG)."""
    c, sigma = _build_slices(jnp.asarray(a, jnp.float64), num_slices)
    return _ozaki_apply(c, sigma, x, num_slices=num_slices).astype(x.dtype)
