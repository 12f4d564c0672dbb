"""Pallas TPU kernel for the banded (DIA) SpMV.

The TPU-native answer to the reference's mat-vec problem for its actual
matrices (5/7-point Laplacian stencils): instead of streaming an O(N^2)
dense A (the reference's design ceiling — SURVEY §5 notes N=16384 fp64
is already 2.1 GB), stream O(ndiag * N) bands and read shifted vector
windows from VMEM. No gather, no atomicAdd (cg.cu:58,107), no
zero-fill kernel (cg.cu:239): each output tile is written exactly once.

Alignment design: Mosaic requires lane-axis (last-dim) loads to start
at multiples of 128, so an arbitrary diagonal offset cannot be loaded
directly. Each shifted window x[base+off : base+off+B] is therefore
assembled from an *aligned* over-read of B+128 lanes starting at
``base + floor(off/128)*128`` followed by an in-register lane rotation
(``pltpu.roll``) by ``off mod 128`` and an aligned prefix slice. The
vector x sits wholly in VMEM (zero-padded by an aligned halo), so the
over-reads are free of HBM cost.

Kernels:
- :func:`dia_matvec`     — y = A x.
- :func:`dia_matvec_dot` — (A x, <x, A x>), the conj reduction of the
  CG (cg.cc:105 / cg.cu:245) fused into the SpMV pass; the scalar
  accumulates across grid steps in SMEM (sequential TPU grid).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.ops._util import LANES, no_x64_trace, plane_matvec
from cgx.ops._util import round_up as _round_up
from cgx.ops._util import sublanes as _sublanes


def _window(x_ref, base, off: int, block: int):
    """Aligned-load + roll assembly of x[base+off : base+off+block].

    ``base`` is a multiple of 128 (block and pad are); ``off`` is a
    static diagonal offset of either sign."""
    off_al = (off // LANES) * LANES  # floor -> aligned, off_al <= off
    lane = off - off_al  # in [0, 128)
    if lane == 0:
        return x_ref[0:1, pl.ds(base + off_al, block)]
    c = x_ref[0:1, pl.ds(base + off_al, block + LANES)]
    # roll takes non-negative shifts: rotating right by (size - lane) is
    # rotating left by lane, i.e. out[i] = c[i + lane] for i < block.
    # int32: under x64 a Python int shift would become an i64 operand,
    # which tpu.dynamic_rotate rejects.
    return pltpu.roll(c, jnp.int32((block + LANES) - lane), 1)[:, :block]


def _pad_for(offsets: Tuple[int, ...]) -> int:
    maxoff = max(max(abs(o) for o in offsets), 1)
    # alignment floor can reach -round_up(maxoff,128); over-read adds 128
    return _round_up(maxoff, LANES) + LANES


def _dia_kernel(offsets, pad, block, x_ref, bands_ref, y_ref):
    j = pl.program_id(0)
    base = j * block + pad
    acc = bands_ref[0:1, :] * _window(x_ref, base, offsets[0], block)
    for d, off in enumerate(offsets[1:], start=1):
        acc += bands_ref[d : d + 1, :] * _window(x_ref, base, off, block)
    y_ref[0:1, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block", "interpret"))
@no_x64_trace
def dia_matvec(
    bands: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x for banded A given as (ndiag, n) bands + static offsets."""
    assert block % LANES == 0, "block must be lane-aligned (multiple of 128)"
    ndiag, n = bands.shape
    n_p = _round_up(n, block)
    pad = _pad_for(offsets)
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n)))
    x_p = jnp.pad(x, (pad, pad + (n_p - n))).reshape(1, -1)
    grid = (n_p // block,)
    y = pl.pallas_call(
        functools.partial(_dia_kernel, offsets, pad, block),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # whole padded x
            pl.BlockSpec(
                (ndiag, block), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_p), bands.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n_p,
            bytes_accessed=(bands_p.size + 2 * n_p) * bands.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_p, bands_p)
    return y[0, :n]


def _stream_window(xwin_ref, slot, pad: int, off: int, block: int):
    """Aligned-load + roll assembly of the shifted window from the
    double-buffered VMEM slab ``xwin_ref[slot]`` (local base = pad)."""
    off_al = (off // LANES) * LANES
    lane = off - off_al
    base = pad + off_al
    if lane == 0:
        return xwin_ref[slot, 0:1, pl.ds(base, block)]
    c = xwin_ref[slot, 0:1, pl.ds(base, block + LANES)]
    return pltpu.roll(c, jnp.int32((block + LANES) - lane), 1)[:, :block]


def _dia_stream_kernel(
    offsets, pad, block, x_hbm, bands_ref, y_ref, xwin, sems
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    width = block + 2 * pad

    def copy(jj, slot):
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(jj * block, width)],
            xwin.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        copy(0, 0).start()

    @pl.when(j + 1 < nb)
    def _():
        copy(j + 1, (j + 1) % 2).start()

    copy(j, j % 2).wait()
    slot = j % 2
    acc = bands_ref[0:1, :] * _stream_window(xwin, slot, pad, offsets[0], block)
    for d, off in enumerate(offsets[1:], start=1):
        acc += bands_ref[d : d + 1, :] * _stream_window(
            xwin, slot, pad, off, block
        )
    y_ref[0:1, :] = acc


@functools.partial(jax.jit, static_argnames=("offsets", "block", "interpret"))
@no_x64_trace
def dia_matvec_stream(
    bands: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    block: int = 131072,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x for banded A, streaming x from HBM block by block.

    The resident :func:`dia_matvec` holds all of (padded) x in VMEM and
    therefore caps out around N~3e6 fp32 on a 16 MB-VMEM core. This
    variant keeps x in HBM (``memory_space=ANY``) and DMAs each row
    block's halo'd window ``x[j*B - pad : (j+1)*B + pad]`` into a
    double-buffered VMEM slab, overlapping the next block's copy with
    the current block's compute (bands and y are auto-pipelined by
    their BlockSpecs). Traffic is the DIA speed-of-light
    ``(ndiag + 2) * N`` words + a 2*pad*nblocks halo surcharge
    (<0.1% at the default block size for Laplacian stencils).

    This is the TPU answer above the VMEM cliff: the XLA shifted-AXPY
    fallback re-reads x once per diagonal from HBM when it no longer
    fits on chip (measured 12% of peak at N=1e7, scripts/cliff_probe.py).
    """
    assert block % LANES == 0, "block must be lane-aligned (multiple of 128)"
    ndiag, n = bands.shape
    n_p = _round_up(n, block)
    pad = _pad_for(offsets)
    width = block + 2 * pad
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n)))
    x_p = jnp.pad(x, (pad, pad + (n_p - n))).reshape(1, -1)
    grid = (n_p // block,)
    y = pl.pallas_call(
        functools.partial(_dia_stream_kernel, offsets, pad, block),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (ndiag, block), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, n_p), bands.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 1, width), bands.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n_p,
            bytes_accessed=(bands_p.size + 2 * n_p) * bands.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_p, bands_p)
    return y[0, :n]


def _dia_stream2d_kernel(
    offsets, m_rows, rows, cols, x_hbm, bands_ref, y_ref, slab, sems
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)

    def copy(jj, slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(jj * rows, rows + 2 * m_rows), :],
            slab.at[slot],
            sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        copy(0, 0).start()

    @pl.when(j + 1 < nb)
    def _():
        copy(j + 1, (j + 1) % 2).start()

    copy(j, j % 2).wait()
    slot = j % 2
    # The vector is viewed row-major as (rows, cols); a flat shift by
    # off = q*cols + s is a row offset (absorbed for free into the
    # slice base) plus a lane roll by s with the wrapped lanes taken
    # from the next row. plane_matvec shares ONE full-slab roll per
    # distinct s across the bands (vs flat_shift's two per offset).
    y_ref[:, :] = plane_matvec(
        lambda d: bands_ref[d], slab[slot], offsets, m_rows, rows, cols
    )


@functools.partial(
    jax.jit, static_argnames=("offsets", "rows", "cols", "interpret")
)
@no_x64_trace
def dia_matvec_stream2d(
    bands: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    rows: int = 256,
    cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """y = A x for banded A, streaming x from HBM in 2-D (rows, cols)
    blocks.

    Same HBM-resident-x design as :func:`dia_matvec_stream` (double-
    buffered DMA of halo'd windows, DIA speed-of-light traffic), but
    the vector is viewed as a row-major (n/cols, cols) plane so every
    VPU op runs at full (8, 128) vreg occupancy — the (1, n) layout
    of the 1-D variant leaves 7 of 8 sublanes idle and was measured
    compute-bound at 16-30% of HBM peak (scripts/stream_probe.py).
    Diagonal shifts decompose as ``off = q*cols + s``: ``q`` rides the
    DMA slice base for free, ``s`` costs 2 lane-rolls + 1 select.

    Block size is rows*cols elements; the halo'd slab adds
    ``2 * (max|off|/cols + 1)`` rows. Defaults (256, 512) give 128 K
    element blocks — 24 HBM-bound us at fp32 on v5e, far above the
    DMA issue overhead, while the working set stays ~12 MB.
    """
    assert cols % LANES == 0, "cols must be lane-aligned (multiple of 128)"
    ndiag, n = bands.shape
    block = rows * cols
    n_p = _round_up(n, block)
    rows_p = n_p // cols
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n))).reshape(
        ndiag, rows_p, cols
    )
    return dia_matvec_stream2d_planes(
        bands_p, x, offsets=offsets, rows=rows, cols=cols,
        interpret=interpret,
    )


def stream2d_band_planes(
    bands, *, rows: int = 256, cols: int = 512
):
    """Pre-padded (ndiag, rows_p, cols) band planes for
    :func:`dia_matvec_stream2d_planes` — build ONCE per operator.

    Works on host numpy or device arrays. The flat band values are
    recoverable as ``planes.reshape(ndiag, -1)[:, :n]``."""
    import numpy as _np

    xp = jnp if isinstance(bands, jnp.ndarray) else _np
    ndiag, n = bands.shape
    block = rows * cols
    n_p = _round_up(n, block)
    return xp.pad(bands, ((0, 0), (0, n_p - n))).reshape(
        ndiag, n_p // cols, cols
    )


@functools.partial(
    jax.jit, static_argnames=("offsets", "rows", "cols", "interpret")
)
@no_x64_trace
def dia_matvec_stream2d_planes(
    bands_p: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    rows: int = 256,
    cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`dia_matvec_stream2d` taking PRE-PADDED band planes
    (``stream2d_band_planes``) — the chained-use entry point.

    The convenience wrapper re-pads the bands on every call; inside a
    while_loop XLA does not hoist the pad (it grows memory), so each
    chained mat-vec paid an extra 2*ndiag*N words of HBM traffic —
    measured 128-158 GB/s apparent vs the kernel's own (ndiag+2)-word
    model (scripts/bw_control3.py, results/hw_queue_r2s8). Carrying the
    planes through the loop restores speed-of-light traffic; only the
    unavoidable x halo pad (2 words) remains per call.
    """
    assert cols % LANES == 0, "cols must be lane-aligned (multiple of 128)"
    ndiag, rows_p, cols_ = bands_p.shape
    assert cols_ == cols and rows_p % rows == 0, (
        f"band planes {bands_p.shape} do not match rows={rows} cols={cols}"
    )
    n = x.shape[0]
    n_p = rows_p * cols
    # read margin rounded up to the sublane tile: Mosaic requires DMA
    # slice offsets/heights on the second-minor dim to be tile-aligned
    p_rows = max(abs(o) // cols + 1 for o in offsets)
    m_rows = _round_up(p_rows, _sublanes(bands_p.dtype))
    x_p = jnp.pad(
        x, (m_rows * cols, m_rows * cols + (n_p - n))
    ).reshape(-1, cols)
    grid = (n_p // (rows * cols),)
    y = pl.pallas_call(
        functools.partial(
            _dia_stream2d_kernel, offsets, m_rows, rows, cols
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec(
                (ndiag, rows, cols),
                lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (rows, cols), lambda j: (j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((rows_p, cols), bands_p.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rows + 2 * m_rows, cols), bands_p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * ndiag * n_p,
            bytes_accessed=(bands_p.size + 2 * n_p) * bands_p.dtype.itemsize,
            transcendentals=0,
        ),
    )(x_p, bands_p)
    return y.reshape(-1)[:n]


def _dia_dot_kernel(offsets, pad, block, x_ref, bands_ref, y_ref, dot_ref):
    j = pl.program_id(0)
    base = j * block + pad
    acc = bands_ref[0:1, :] * _window(x_ref, base, offsets[0], block)
    for d, off in enumerate(offsets[1:], start=1):
        acc += bands_ref[d : d + 1, :] * _window(x_ref, base, off, block)
    y_ref[0:1, :] = acc

    part = jnp.sum(x_ref[0:1, pl.ds(base, block)] * acc)

    @pl.when(j == 0)
    def _():
        dot_ref[0, 0] = jnp.zeros_like(dot_ref[0, 0])

    dot_ref[0, 0] += part


@functools.partial(jax.jit, static_argnames=("offsets", "block", "interpret"))
@no_x64_trace
def dia_matvec_dot(
    bands: jnp.ndarray,
    x: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    block: int = 1024,
    interpret: bool = False,
):
    """(A x, <x, A x>) in one fused pass over the bands.

    ``bands`` may be pre-padded to a multiple of ``block`` (pass the
    ORIGINAL n via the vector): chained users (dia_cg_solve_pallas)
    pad once outside their while loop — XLA does not hoist the
    memory-growing pad itself (scripts/bw_control3.py).
    """
    assert block % LANES == 0
    ndiag, nb_ = bands.shape
    n = x.shape[0]
    n_p = _round_up(n, block)
    assert nb_ in (n, n_p), f"bands width {nb_} matches neither n nor n_p"
    pad = _pad_for(offsets)
    bands_p = (
        bands if nb_ == n_p
        else jnp.pad(bands, ((0, 0), (0, n_p - n)))
    )
    x_p = jnp.pad(x, (pad, pad + (n_p - n))).reshape(1, -1)
    grid = (n_p // block,)
    y, dot = pl.pallas_call(
        functools.partial(_dia_dot_kernel, offsets, pad, block),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (ndiag, block), lambda j: (0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, block), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n_p), bands.dtype),
            jax.ShapeDtypeStruct((1, 1), bands.dtype),
        ),
        interpret=interpret,
    )(x_p, bands_p)
    return y[0, :n], dot[0, 0]
