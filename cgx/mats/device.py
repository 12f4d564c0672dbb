"""Device-side problem builders.

The host generators (:mod:`cgx.mats.generators`) materialize bands in
NumPy and upload them. That is fine up to ~1e6 unknowns, but the
flagship large-N problems (N = 4e6..1e7, fp64) would move 200-400 MB
of formulaic constants through the device transport per run. The
builders here compile a few-KB XLA program that writes the same arrays
directly into HBM.

Parity: the band formulas are exact (values in {4, -1, 0}, identical
in any binary float format), so ``lap2d_fd_op(g).bands`` equals
``lap2d_fd(g).bands`` bit-for-bit (tested). The source term matches
the host ``source_term`` (cg.cc:218-234: b[i] = -2 i pi^2 sin^2(10 pi
i h)) to ~1 ulp — the device ``sin`` may round differently from
libm's; the flagship benchmarks therefore always solve AND
quality-check against the same device-built b.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cgx.solver.operators import DiaOperator


@partial(jax.jit, static_argnames=("g", "dtype"))
def _lap2d_bands(g: int, dtype: str) -> jnp.ndarray:
    n = g * g
    i = jnp.arange(n, dtype=jnp.int32)
    col = i % g
    neg = jnp.full((n,), -1.0, dtype)
    zero = jnp.zeros((n,), dtype)
    return jnp.stack([
        jnp.where(i >= g, neg, zero),           # A[i, i-g]
        jnp.where(col > 0, neg, zero),          # A[i, i-1] within grid row
        jnp.full((n,), 4.0, dtype),             # diagonal
        jnp.where(col < g - 1, neg, zero),      # A[i, i+1] within grid row
        jnp.where(i < n - g, neg, zero),        # A[i, i+g]
    ])


def lap2d_fd_op(g: int, dtype=jnp.float64) -> DiaOperator:
    """Device-built :func:`cgx.mats.generators.lap2d_fd` (the matrix of
    lap2D_5pt_n100.mtx at g=100) as a :class:`DiaOperator`."""
    g = int(g)
    return _lap2d_bands(g, jnp.dtype(dtype).name), (-g, -1, 0, 1, g)


@partial(jax.jit, static_argnames=("g", "dtype"))
def _lap3d_bands(g: int, dtype: str) -> jnp.ndarray:
    n = g * g * g
    g2 = g * g
    i = jnp.arange(n, dtype=jnp.int32)
    x = i % g
    y = (i // g) % g
    neg = jnp.full((n,), -1.0, dtype)
    zero = jnp.zeros((n,), dtype)
    return jnp.stack([
        jnp.where(i >= g2, neg, zero),
        jnp.where(y > 0, neg, zero),
        jnp.where(x > 0, neg, zero),
        jnp.full((n,), 6.0, dtype),
        jnp.where(x < g - 1, neg, zero),
        jnp.where(y < g - 1, neg, zero),
        jnp.where(i < n - g2, neg, zero),
    ])


def lap3d_fd_op(g: int, dtype=jnp.float64) -> DiaOperator:
    """Device-built :func:`cgx.mats.generators.lap3d_fd`."""
    g = int(g)
    g2 = g * g
    return (
        _lap3d_bands(g, jnp.dtype(dtype).name),
        (-g2, -g, -1, 0, 1, g, g2),
    )


def _wrap(pair) -> DiaOperator:
    bands, offsets = pair
    return DiaOperator(bands, offsets)


def lap2d_operator(g: int, dtype=jnp.float64) -> DiaOperator:
    return _wrap(lap2d_fd_op(g, dtype))


def lap3d_operator(g: int, dtype=jnp.float64) -> DiaOperator:
    return _wrap(lap3d_fd_op(g, dtype))


@partial(jax.jit, static_argnames=("n", "dtype"))
def _source_term(n: int, dtype: str) -> jnp.ndarray:
    # the index->value map needs fp64 intermediates (i spans 1e7 and
    # the sin argument must keep i*h exact-ish); cast only at the end
    compute = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    i = jnp.arange(n, dtype=compute)
    s = jnp.sin(10.0 * jnp.pi * i / n)
    return (-2.0 * i * jnp.pi * jnp.pi * s * s).astype(dtype)


def source_term_device(n: int, dtype=jnp.float64) -> jnp.ndarray:
    """Device-built reference source term (cg.cc:218-234), h = 1/n."""
    return _source_term(int(n), jnp.dtype(dtype).name)
