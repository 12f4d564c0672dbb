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


def plane_shifts(v, offsets, base_rows: int, rows: int, cols: int):
    """Shifted (rows, cols) windows of an in-register halo'd plane
    VALUE ``v``, one per entry of ``offsets`` — the shared-roll form of
    :func:`flat_shift`.

    flat_shift pays 2 ``pltpu.roll``s per offset because it rolls its
    two candidate row-windows separately. A lane roll is row-local, so
    it commutes with row-windowing: rolling the FULL plane once per
    distinct ``s = off % cols`` and slicing row windows of the rolled
    value yields identical results with HALF the rolls — and offsets
    that share ``s`` (e.g. +1 and 1+cols, or ±g after grid-stride
    padding) share a single roll. Measured on the streaming CG kernel
    (BENCHMARKS.md session 10): the 2-roll+select per-offset form is
    the dominant in-kernel VPU cost behind the 651 GB/s DMA-machinery
    ceiling.

    ``base_rows`` is the plane row (within ``v``) where the output
    region starts; reads reach rows [base_rows + off//cols,
    base_rows + off//cols + rows + 1), so ``v`` must carry the same
    halo margin flat_shift's callers provide.
    """
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    rolled = {}
    lane = None
    outs = []
    for off in offsets:
        q, s = divmod(off, cols)
        base = base_rows + q
        if s == 0:
            outs.append(v[base : base + rows, :])
            continue
        if s not in rolled:
            rolled[s] = pltpu.roll(v, cols - s, 1)
        r = rolled[s]
        if lane is None:
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (rows, cols), 1
            )
        a = r[base : base + rows, :]
        b = r[base + 1 : base + 1 + rows, :]
        outs.append(jnp.where(lane < cols - s, a, b))
    return outs


def plane_matvec(bands_load, v, offsets, base_rows: int, rows: int,
                 cols: int):
    """Banded mat-vec ``y[i] = sum_d band_d[i] * v[i + off_d]`` on the
    (rows, cols) region of plane value ``v`` starting at ``base_rows``,
    using shared-roll shifts. ``bands_load(d) -> (rows, cols)`` reads
    band ``d``'s values for the output region."""
    shifts = plane_shifts(v, offsets, base_rows, rows, cols)
    acc = bands_load(0) * shifts[0]
    for d in range(1, len(offsets)):
        acc += bands_load(d) * shifts[d]
    return acc


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


def pow2_rhs_scale(b, x0=None):
    """Exact power-of-2 down/up scale pair normalizing ``max|b|``
    (and ``max|x0|``) into [0.5, 1).

    Rationale (round-4, s-step gate at N=1.024e7): the reference's
    source term b[i] = -2 i pi^2 sin^2(10 pi i h) (MPI/cg.cc:218-234)
    reaches ~2e8 at the flagship size, so ||r||^2 ~ 1e23 in f32 and the
    s-step replay's PRODUCTS of Gram entries (quadratic forms of basis
    vectors, each ~1e23-1e30) overflow f32 -> inf -> instant breakdown.
    Multiplying by an exact power of two commutes with IEEE rounding
    (absent over/underflow), so solving the scaled system and scaling
    back is BITWISE identical to the unscaled solve for well-scaled b
    -- pinned trajectories and iteration counts are untouched -- while
    pulling huge-norm problems back into f32's comfortable range.

    Returns ``(down, up)`` with ``down = 2**-e``, ``up = 2**e`` exact.
    Zero b (and x0) yields ``(1, 1)``.
    """
    import jax.numpy as jnp

    amax = jnp.max(jnp.abs(b))
    if x0 is not None:
        amax = jnp.maximum(amax, jnp.max(jnp.abs(x0)))
    _, e = jnp.frexp(amax)  # amax = m * 2**e, m in [0.5, 1)
    one = jnp.ones((), b.dtype)
    return jnp.ldexp(one, -e), jnp.ldexp(one, e)


def f32_exact(fn):
    """Trace ``fn`` under HIGHEST matmul precision.

    On TPU the DEFAULT precision lowers f32 matmuls to ONE bf16 MXU
    pass — a 2^-8 relative truncation of every operand. Solver
    recurrence products (block X += P alpha, deflation x += W corr,
    s-step basis recombinations) are O(n s) / O(n k) FLOPs — noise
    next to the mat-vec — but a 2^-8 per-iteration perturbation there
    stalls or degrades convergence at high kappa: measured on-device
    for block CG at g=1000, s=8, k=1200 — worst-column true rel
    residual 11.46 under DEFAULT vs 0.215 under HIGHEST (round-5 econ
    probe diagnosis). Wrap the solver loop so every dot it traces is
    exact f32; CPU/GPU f32 matmuls are already exact, so this only
    changes TPU lowering. CI pins the resulting jaxpr precision
    (tests/test_blockcg.py::test_block_matmuls_are_precision_pinned).
    """
    from functools import wraps

    import jax

    @wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
