"""Shared kernel utilities."""

from __future__ import annotations

import functools

import jax


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
