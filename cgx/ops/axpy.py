"""Fused vector-update kernels for the CG iteration tail.

The reference spends three separate streaming passes after the mat-vec:
``x += alpha p`` and ``r -= alpha Ap`` (two cblas_daxpy, cg.cc:110-113
/ two sumVec launches, cg.cu:250-253) and then a full read of r for
``rsnew = <r, r>`` (cg.cc:116 / cg.cu:256). That is 5 vector reads +
2 writes of HBM traffic. :func:`fused_update_rs` does it in ONE pass:
reads x, p, r, Ap, writes x', r', and emits per-tile partials of
<r', r'> while r' is still in registers — 4 reads + 2 writes, and the
dot costs nothing extra.

:func:`fused_axpby` is the generic ``a = alpha*a + beta*b`` of the
reference's sumVec kernel (cg.cu:112-130), used for the direction
update ``p = beta p + r`` (cg.cu:266).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.ops._util import no_x64_trace


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _update_rs_kernel(x_ref, p_ref, r_ref, ap_ref, alpha_ref, xo_ref, ro_ref, rs_ref):
    j = pl.program_id(0)
    alpha = alpha_ref[0, 0]
    xo_ref[:] = x_ref[:] + alpha * p_ref[:]
    r_new = r_ref[:] - alpha * ap_ref[:]
    ro_ref[:] = r_new

    @pl.when(j == 0)
    def _():
        rs_ref[0, 0] = jnp.zeros_like(rs_ref[0, 0])

    rs_ref[0, 0] += jnp.sum(r_new * r_new)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
@no_x64_trace
def fused_update_rs(
    x: jnp.ndarray,
    p: jnp.ndarray,
    r: jnp.ndarray,
    ap: jnp.ndarray,
    alpha: jnp.ndarray,
    *,
    block: int = 2048,
    interpret: bool = False,
):
    """(x + alpha p, r - alpha Ap, <r', r'>) in one streaming pass."""
    n = x.shape[0]
    n_p = _round_up(n, block)

    def pad(v):
        return jnp.pad(v, (0, n_p - n)).reshape(1, -1)

    grid = (n_p // block,)
    spec = pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM)
    xo, ro, rs = pl.pallas_call(
        _update_rs_kernel,
        grid=grid,
        in_specs=[
            spec,
            spec,
            spec,
            spec,
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            spec,
            spec,
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_p), x.dtype),
            jax.ShapeDtypeStruct((1, n_p), x.dtype),
            jax.ShapeDtypeStruct((1, 1), x.dtype),
        ),
        interpret=interpret,
    )(pad(x), pad(p), pad(r), pad(ap), jnp.asarray(alpha).reshape(1, 1))
    return xo[0, :n], ro[0, :n], rs[0, 0]


def _axpby_kernel(a_ref, b_ref, alpha_ref, beta_ref, out_ref):
    out_ref[:] = alpha_ref[0, 0] * a_ref[:] + beta_ref[0, 0] * b_ref[:]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
@no_x64_trace
def fused_axpby(
    a: jnp.ndarray,
    b: jnp.ndarray,
    alpha: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    block: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """alpha*a + beta*b (sumVec parity, cg.cu:112-130)."""
    n = a.shape[0]
    n_p = _round_up(n, block)

    def pad(v):
        return jnp.pad(v, (0, n_p - n)).reshape(1, -1)

    grid = (n_p // block,)
    spec = pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        _axpby_kernel,
        grid=grid,
        in_specs=[spec, spec, sspec, sspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1, n_p), a.dtype),
        interpret=interpret,
    )(pad(a), pad(b), jnp.asarray(alpha).reshape(1, 1), jnp.asarray(beta).reshape(1, 1))
    return out[0, :n]
