"""Accurate scalar reductions.

On TPU, XLA emulates float64; element-wise VPU ops keep full fp64
accuracy but the 1-D ``jnp.dot`` contraction routes through a path that
loses ~7 decimal digits (measured ~2.6e-9 relative error on a 1e5-long
dot vs numpy). The reference relies on accurate dot products
(cblas_ddot / cublasDdot) to drive the alpha/beta recurrences and the
absolute 1e-10 convergence test, so we route every scalar reduction
through element-wise multiply + sum, which XLA keeps on the VPU in full
precision (measured ~6e-16 relative error).
"""

from __future__ import annotations

import jax.numpy as jnp


def vdot(a: jnp.ndarray, b: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Accurate <a, b> via VPU multiply + tree-sum.

    When ``precision`` is a dtype, products are accumulated in it
    (the mixed-precision mode: fp32 vectors, fp64 accumulation).
    """
    if precision is not None:
        a = a.astype(precision)
        b = b.astype(precision)
    return jnp.sum(a * b)


def norm2(a: jnp.ndarray, precision=None) -> jnp.ndarray:
    """Accurate ||a||_2."""
    return jnp.sqrt(vdot(a, a, precision=precision))
