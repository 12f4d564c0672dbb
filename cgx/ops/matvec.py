"""Pallas TPU kernels for the dense mat-vec (reference L2).

The reference's CUDA kernels tile the dense mat-vec over a 2-D
(rows x columns) grid and merge per-tile partial sums with
``atomicAdd`` (MatVec cg.cu:14-61, MatVecT cg.cu:63-110, grid setup
cg.cu:196-210). On TPU there are no atomics and none are needed: the
output row-block is *revisited* across the column-tile grid dimension
and accumulated in place in VMEM — race-free by construction
(SURVEY §5 'race detection' row). The coalescing concern of MatVecT
(consecutive threads reading consecutive addresses) maps to the
(8,128) sublane/lane tiling Mosaic applies to each VMEM block.

Two kernels:

- :func:`dense_matvec` — y = A @ x, tiled (block_rows x block_cols).
- :func:`dense_matvec_dot` — additionally emits per-row-tile partials
  of <x, A x>, fusing the CG's ``conj = <p, Ap>`` reduction
  (cg.cc:105 / cg.cu:245) into the mat-vec pass: Ap never makes a
  second trip from HBM.

Tile sizes are exposed as arguments so the reference's
NUM_THREADS/BLOCK_WIDTH sweep (cg.run) has a direct analogue.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.ops._util import no_x64_trace


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x, m: int, axis: int):
    size = x.shape[axis]
    rem = (-size) % m
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads)


def _matvec_kernel(a_ref, x_ref, y_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # precision=HIGHEST: the MXU's default f32 path multiplies in bf16
    # (measured 2e-3 relative error on TPU); full-precision passes
    # restore ~1e-7
    y_ref[:] += jnp.dot(
        a_ref[:],
        x_ref[:],
        preferred_element_type=y_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
@no_x64_trace
def dense_matvec(
    a: jnp.ndarray,
    x: jnp.ndarray,
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A @ x with a (rows x cols)-tiled Pallas kernel.

    Cites: MatVec/MatVecT cg.cu:14-110 (the 2-D decomposition), with
    VMEM accumulation replacing atomicAdd."""
    n_rows, n_cols = a.shape
    a_p = _pad_to(_pad_to(a, block_rows, 0), block_cols, 1)
    x_p = _pad_to(x, block_cols, 0).reshape(-1, 1)
    m_p, n_p = a_p.shape
    grid = (m_p // block_rows, n_p // block_cols)
    y = pl.pallas_call(
        _matvec_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_cols, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (block_rows, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_p, 1), a.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p,
            bytes_accessed=a_p.size * a_p.dtype.itemsize,
            transcendentals=0,
        ),
    )(a_p, x_p)
    return y[:n_rows, 0]


def _matvec_dot_kernel(a_ref, x_ref, xrow_ref, y_ref, dot_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    y_ref[:] += jnp.dot(
        a_ref[:],
        x_ref[:],
        preferred_element_type=y_ref.dtype,
        precision=jax.lax.Precision.HIGHEST,
    )

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dot_ref[0, 0] = jnp.zeros_like(dot_ref[0, 0])

    # On the last column step the row-block of y=Ax is complete: fuse
    # the <x, Ax> partial here while y is still in VMEM. The scalar
    # accumulates across row tiles in SMEM (sequential TPU grid).
    @pl.when(j == nj - 1)
    def _():
        dot_ref[0, 0] += jnp.sum(xrow_ref[:] * y_ref[:])


@functools.partial(jax.jit, static_argnames=("block_rows", "block_cols", "interpret"))
@no_x64_trace
def dense_matvec_dot(
    a: jnp.ndarray,
    x: jnp.ndarray,
    *,
    block_rows: int = 256,
    block_cols: int = 512,
    interpret: bool = False,
):
    """(A @ x, <x, A x>) in one pass over A.

    Fuses the CG mat-vec with the conj reduction (cg.cc:100-106 /
    cg.cu:239-246 do these as two passes + a D2H copy)."""
    n_rows, n_cols = a.shape
    a_p = _pad_to(_pad_to(a, block_rows, 0), block_cols, 1)
    x_p = _pad_to(x, block_cols, 0).reshape(-1, 1)
    xrow_p = _pad_to(x, block_rows, 0).reshape(-1, 1)
    m_p, n_p = a_p.shape
    grid = (m_p // block_rows, n_p // block_cols)
    y, dot = pl.pallas_call(
        _matvec_dot_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_rows, block_cols),
                lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (block_cols, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (block_rows, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (block_rows, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_p, 1), a.dtype),
            jax.ShapeDtypeStruct((1, 1), a.dtype),
        ),
        interpret=interpret,
    )(a_p, x_p, xrow_p)
    return y[:n_rows, 0], dot[0, 0]
