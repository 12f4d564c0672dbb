"""Shared kernel utilities."""

from __future__ import annotations

import functools

import jax

LANES = 128  # TPU vreg lane count (last-dim tile)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sublanes(dtype) -> int:
    """Rows per sublane tile for ``dtype``: (8, 128) for 32-bit types,
    (16, 128) for 16-bit, (32, 128) for 8-bit.

    Mosaic requires DMA (``make_async_copy``) slice offsets and heights
    along the second-minor dimension to be multiples of this — "Slice
    shape along dimension 0 must be aligned to tiling (8)" otherwise —
    so streaming kernels must round their halo margins up to it.
    """
    import numpy as np

    return 8 * 4 // np.dtype(dtype).itemsize


def flat_shift(load, base_rows: int, off: int, rows: int, cols: int):
    """Shifted (rows, cols) window of a flat vector viewed row-major as
    a plane, read through ``load(row0, nrows) -> (nrows, cols)``.

    A flat shift by ``off = q*cols + s`` decomposes into a row offset
    (free — rides the slice base) plus a lane roll by ``s`` with the
    wrapped lanes taken from the next row: 2 rolls + 1 select at full
    (8, 128) vreg width. ``base_rows`` is the plane row where the
    output region starts; reads reach rows [base_rows - p_rows,
    base_rows + rows + p_rows), so callers provide a p_rows =
    max|off|//cols + 1 margin on each side.

    The ``load`` indirection serves every storage the kernels use: a
    DMA slab slot, a resident VMEM ref, or an in-register value.
    """
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    q, s = divmod(off, cols)
    base = base_rows + q
    if s == 0:
        return load(base, rows)
    a = pltpu.roll(load(base, rows), cols - s, 1)
    b = pltpu.roll(load(base + 1, rows), cols - s, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return jnp.where(lane < cols - s, a, b)


def no_x64_trace(fn):
    """Trace ``fn`` with x64 disabled.

    Mosaic rejects i64 index arithmetic (BlockSpec index_maps and
    in-kernel ``pl.ds`` offsets become i64 when jax_enable_x64 is on,
    failing to legalize ``func.return (i64, i64)``). The kernels are
    fp32/bf16-typed anyway — existing arrays keep their dtypes; only
    trace-time literal/index promotion is affected."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import numpy as np

        def _wide(v):
            dt = getattr(v, "dtype", None)
            return dt is not None and np.dtype(dt).itemsize == 8

        if any(map(_wide, args)) or any(map(_wide, kwargs.values())):
            # 64-bit data path (CPU/interpret) — keep x64 semantics.
            return fn(*args, **kwargs)
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper
