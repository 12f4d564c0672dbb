"""Ozaki-style split-precision dense fp64 mat-vec on the MXU.

The reference's regime is dense fp64 CG (MPI cg.cc:80-101 runs
cblas_dgemv on fp64; CUDA cg.cu:14-110 likewise). On TPU fp64 matmuls
are software-emulated and run at ~1.7% of peak (BENCHMARKS.md dense
table: 58.4 ms/mat-vec at N=1e4 vs 0.578 ms for fp32). This module
recovers fp64-*quality* dense mat-vecs from integer MXU passes using
the Ozaki splitting scheme (Ozaki et al., "Error-free transformations
of matrix multiplication", Numer. Algorithms 2012; the same idea
underlies fp64 emulation on NVIDIA tensor cores — here retargeted to
the TPU's native s8 x s8 -> s32 MXU path):

  1. Scale each row of A by a power of two so |A_hat| <= 1/2, then
     slice the mantissa into S = 8 slices of BETA = 7 bits each with
     FLOOR-based splitting: the leading slice is an integer in
     [-64, 64], every later slice an integer in [0, 127] — all int8.
  2. Scale x per right-hand column the same way (x_hat sliced into 8
     int8 slices).
  3. One int8 matmul (stacked slices (S*n, n) @ (n, T*ncols)) computes
     ALL S*T pair products with int32 accumulation — EXACT, with no
     column blocking at all: |products| < 2^14, so up to 2^17
     accumulands fit in int32 without overflow (n <= 131072 — a 137 GB
     dense fp64 matrix; anything larger was never dense).
  4. The S*T per-pair partials are combined in fp64 on the VPU with
     exact power-of-two weights 2^(-7(s+t+2)): O(S*T*n) work, the only
     emulated-fp64 cost in the pipeline.

Total error is only the dropped slicing tails: ~2^(-7S) = 2^-56 of
the absolute-value mass of each dot for the default S = 8 — below a
genuine fp64 mat-vec's own ~n*2^-53 accumulation bound. Traffic is
S = 8 one-byte copies of A: the SAME bytes/entry as one fp64 pass,
read at HBM speed instead of crawling through fp64 emulation.

Design history (measured on v5e, N=1e4): bf16-slice variants needed
column-blocking to keep the fp32 accumulator exact (24-bit mantissa),
and the per-block partial combination in emulated fp64 dominated:
8/8-bit slices @ 256-col blocks ran 25.8 ms/iter batched and 12.3 ms
with a flat block-diagonal matmul; asymmetric 8/4-bit slices @ 2048
blocks cut the partial count 8x to 6.6 ms. The int8/int32 scheme
removes blocking entirely (int32's 31-bit headroom vs fp32's 24) and
with it most of the fp64 combine work.

Exactness invariants (asserted in tests/test_ozaki.py):
  - 2*BETA + log2(NMAX) <= 31  (int32 accumulator never overflows)
  - slice values: integers, |C_0| <= 2^(BETA-1), 0 <= C_s <= 2^BETA-1
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

BETA = 7  # mantissa bits per slice (int8-representable)
NMAX = 1 << 17  # 2*BETA + log2(NMAX) = 31: int32-exact accumulation

# Exact powers of two over the fp64 normal exponent range, precomputed
# on the host. Neither jnp.exp2 (lowers to exp(x*ln2): exp2(8.0) ->
# 255.999...94 on some backends) nor jnp.ldexp (s64 bitcast-convert,
# rejected by the TPU x64 rewriter) can produce these on device.
_EMIN, _EMAX = -1022, 1023
_POW2_TABLE = np.ldexp(1.0, np.arange(_EMIN, _EMAX + 1))


def _pow2_bound(v: jnp.ndarray) -> jnp.ndarray:
    """Smallest power of two STRICTLY greater than v via 2*ceil —
    guarantees |v| / result <= 1/2 (elementwise; zeros map to 1.0).
    Power-of-two scaling keeps the subsequent divisions exact. Values
    outside the fp64 normal range clamp harmlessly (the scale merely
    exceeds the max; |A| > 2^1022 is out of scope)."""
    safe = jnp.where(v > 0, v, 1.0)
    e = jnp.clip(
        jnp.ceil(jnp.log2(safe)), _EMIN, _EMAX - 1
    ).astype(jnp.int32)
    p = jnp.asarray(_POW2_TABLE, safe.dtype)[e - _EMIN]
    # guard log2 rounding at exact-power boundaries
    p = jnp.where(p < safe, p * 2.0, p)
    return jnp.where(v > 0, 2.0 * p, 1.0)


def _slice_mantissa(r: jnp.ndarray, num_slices: int):
    """Floor-split |r| <= 1/2 into int8 slices of BETA bits.

    r = sum_s C_s * 2^(-BETA*(s+1)) + tail, 0 <= tail < 2^(-BETA*S).
    C_0 in [-2^(BETA-1), 2^(BETA-1)]; later slices in [0, 2^BETA - 1]
    because floor leaves a NONNEGATIVE remainder — exactly the int8
    range without the +-2^BETA boundary a round-based split produces.
    """
    slices = []
    for s in range(num_slices):
        scale = 2.0 ** ((s + 1) * BETA)  # exact Python-float constant
        c = jnp.floor(r * scale)
        # boundary clamp: when a tiny negative value's remainder is
        # absorbed to exactly 2^(-BETA*s) (fp64 cancellation, e.g.
        # x = -1e-29 with column max ~1e5), the next floor lands on
        # exactly 2^BETA — one past the int8 range. Clamping leaves a
        # remainder of 1/scale that the NEXT slice picks up; the final
        # tail stays < 2^(-BETA*S) either way.
        c = jnp.minimum(c, 2.0**BETA - 1.0)
        slices.append(c.astype(jnp.int8))
        r = r - c / scale
    return slices


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _build_slices(a: jnp.ndarray, num_slices: int):
    n, m = a.shape
    row_max = jnp.max(jnp.abs(a), axis=1)
    sigma = _pow2_bound(row_max)
    a_hat = a / sigma[:, None]
    parts = _slice_mantissa(a_hat, num_slices)
    c = jnp.stack(parts)  # (S, n, m) int8
    return c, sigma


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _slice_vector(x: jnp.ndarray, num_slices: int):
    """Slice an (m, ncols) block of right-hand vectors: per-column
    power-of-two scaling, BETA-bit int8 slices."""
    tau = _pow2_bound(jnp.max(jnp.abs(x), axis=0))  # (ncols,)
    x_hat = x / tau[None, :]
    parts = _slice_mantissa(x_hat, num_slices)
    return jnp.stack(parts), tau  # (T, m, ncols), (ncols,)


@functools.partial(jax.jit, static_argnames=("num_slices",))
def _ozaki_apply(c, sigma, x, *, num_slices: int):
    f64 = sigma.dtype
    squeeze = x.ndim == 1
    x2 = x[:, None] if squeeze else x
    d, tau = _slice_vector(x2.astype(f64), num_slices)
    s_tot = num_slices
    n = c.shape[1]
    m = c.shape[2]
    ncols = x2.shape[1]

    # ONE int8 matmul computes every (s, t) pair partial exactly:
    # (S*n, m) @ (m, T*ncols) -> int32, no accumulator rounding.
    c_cat = c.reshape(s_tot * n, m)
    d_cat = jnp.transpose(d, (1, 0, 2)).reshape(m, s_tot * ncols)
    p = jnp.dot(
        c_cat, d_cat, preferred_element_type=jnp.int32
    ).reshape(s_tot, n, s_tot, ncols)

    # fp64 combination — the ONLY inexact arithmetic in the pipeline
    # (and it must be fp64: any narrower running sum would truncate
    # pairs below its mantissa, which is the information this scheme
    # exists to keep). Weights are exact powers of two.
    w = jnp.asarray(
        [
            [2.0 ** (-(s + t + 2) * BETA) for t in range(s_tot)]
            for s in range(s_tot)
        ],
        f64,
    )
    y = jnp.einsum("sntc,st->nc", p.astype(f64), w)
    y = sigma[:, None] * y * tau[None, :]
    return y[:, 0] if squeeze else y


@jax.tree_util.register_pytree_node_class
class OzakiDenseOperator:
    """Dense fp64-quality operator from int8 slices (MXU speed).

    Drop-in for the fp64 ``DenseOperator`` in CG / refinement: the
    mat-vec error is ~2^(-7*S) of the dot's absolute mass — below the
    inherent fp64 accumulation roundoff for the default S=8 — while
    every O(n^2) FLOP runs on the MXU's native s8 x s8 -> s32 path.
    Reference regime: the dense dgemv of cg.cc:101 / the MatVecT
    kernel of cg.cu:63-110.
    """

    def __init__(self, c, sigma, diag, num_slices: int):
        self.c = c  # (S, n, n) int8 slices
        self.sigma = sigma  # (n,) fp64 per-row power-of-two scale
        self._diag = diag  # (n,) fp64
        self.num_slices = num_slices

    @classmethod
    def from_dense(cls, a: jnp.ndarray, num_slices: int = 8):
        if a.shape[1] > NMAX:
            raise ValueError(
                f"OzakiDenseOperator supports n <= {NMAX} (int32-exact "
                f"accumulation); a {a.shape[1]}-column dense matrix is "
                f"{8 * a.shape[0] * a.shape[1] / 1e9:.0f} GB — use a "
                "sparse/banded operator instead"
            )
        if a.dtype != jnp.float64:
            a = a.astype(jnp.float64)
        c, sigma = _build_slices(a, num_slices)
        return cls(c, sigma, jnp.diagonal(a), num_slices)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.c.shape[1], self.c.shape[2])

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
    a: jnp.ndarray, x: jnp.ndarray, *, num_slices: int = 8
) -> jnp.ndarray:
    """One-shot fp64-quality y = A @ x via the Ozaki splitting.

    Slices A on every call — use :class:`OzakiDenseOperator` to amortize
    the O(S n^2) slicing across many mat-vecs (e.g. inside CG)."""
    a = jnp.asarray(a, jnp.float64)
    if a.shape[1] > NMAX:
        raise ValueError(f"ozaki_matvec supports n <= {NMAX}")
    c, sigma = _build_slices(a, num_slices)
    return _ozaki_apply(c, sigma, x, num_slices=num_slices).astype(x.dtype)


def build_slices_np(a: "np.ndarray", num_slices: int = 8):
    """Host-side (numpy) slicing mirroring :func:`_build_slices` —
    used by the sharded dense path, which slices A before device
    placement (the shards are then device_put int8, 1/8 the bytes of
    the fp64 upload per slice)."""
    a = np.asarray(a, np.float64)
    n, m = a.shape
    if m > NMAX:
        raise ValueError(f"Ozaki slicing supports n <= {NMAX}")
    row_max = np.max(np.abs(a), axis=1)
    safe = np.where(row_max > 0, row_max, 1.0)
    mant, e = np.frexp(safe)  # safe = mant * 2^e, mant in [0.5, 1)
    # smallest power of two >= safe: 2^e, except exact powers (mant
    # == 0.5) where it is 2^(e-1) = safe itself; sigma doubles it so
    # |a_hat| <= 1/2 (matches the device _pow2_bound)
    pow2ceil = np.ldexp(1.0, np.where(mant == 0.5, e - 1, e))
    sigma = 2.0 * pow2ceil
    a_hat = a / sigma[:, None]
    slices = np.empty((num_slices, n, m), np.int8)
    r = a_hat
    for s in range(num_slices):
        scale = 2.0 ** ((s + 1) * BETA)
        c = np.floor(r * scale)
        np.minimum(c, 2.0**BETA - 1.0, out=c)  # boundary clamp, see above
        slices[s] = c.astype(np.int8)
        r = r - c / scale
    return slices, sigma
