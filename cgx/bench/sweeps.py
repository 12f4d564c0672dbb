"""Benchmark sweep harness (reference L6: the cg.run SLURM scripts).

Reproduces the reference's three experiment families with the same CSV
schemas so the analysis notebook logic (L7) consumes either dataset:

- strong scaling (MPI/cg.run:15-19): N in {1024,2048,4096,8192} x
  p in {1,2,4,...}; schema ``N,psize,seconds``.
- weak scaling (MPI/cg.run:22-44): ladders N(p) = N0 * sqrt(p) with
  iterations fixed at 200; schema ``N,psize,seconds``.
- kernel sweep (CUDA/cg.run:20-30): tile-size sweep of the Pallas
  dense kernel (NUM_THREADS -> block_rows, BLOCK_WIDTH -> block_cols);
  schema ``threads,block_width,seconds``.

On one host these sweep over mesh sizes built from available devices
(virtual CPU devices in tests; real chips on a slice).
"""

from __future__ import annotations

import math
import time
from typing import List, Optional, Sequence

import jax

from cgx.config import DEFAULT_TOLERANCE, VMEM_BUDGET_BYTES
from cgx.mats.generators import lap2d_reference, source_term
from cgx.parallel.mesh import make_mesh
from cgx.parallel.sharded_cg import sharded_cg_solve


def _time_solve(fn, repeats: int = 1) -> float:
    """Best-of-N wall time with the hardened methodology
    (BENCHMARKS.md): ``fn(jitter)`` receives a FRESH random relative
    perturbation scale per run (runtime result caches match identical
    (program, inputs) even across processes, so index-derived inputs
    measure nothing on re-runs), and each timed region ends with a
    scalar device->host fetch (block_until_ready alone has been
    observed to return before execution completes on tunneled dev
    chips)."""
    import numpy as np

    rng = np.random.default_rng(time.time_ns() % (2**63))
    best = math.inf
    for _ in range(repeats):
        jitter = 1e-6 * rng.standard_normal()
        t0 = time.perf_counter()
        res = fn(jitter)
        leaf = jax.tree_util.tree_leaves(res)[0]
        _ = np.asarray(leaf.ravel()[0])  # scalar fetch forces completion
        best = min(best, time.perf_counter() - t0)
    return best


def strong_scaling(
    sizes: Sequence[int] = (1024, 2048, 4096, 8192),
    device_counts: Optional[Sequence[int]] = None,
    out_file: Optional[str] = None,
    *,
    fmt: str = "dense",
    tol: float = DEFAULT_TOLERANCE,
    repeats: int = 1,
) -> List[str]:
    """Strong-scaling sweep; returns (and optionally appends) CSV rows
    ``N,psize,seconds`` (strong_scaling.txt schema)."""
    if device_counts is None:
        nd = len(jax.devices())
        device_counts = [p for p in (1, 2, 4, 8, 16, 32, 64) if p <= nd]
    rows = []
    for n in sizes:
        dia = lap2d_reference(n)
        mat = dia.to_dense() if fmt == "dense" else dia
        b = source_term(n)
        for p in device_counts:
            mesh = make_mesh(p)
            elapsed = _time_solve(
                lambda jit_eps: sharded_cg_solve(
                    mat, b * (1.0 + jit_eps), mesh=mesh, tol=tol
                ).x,
                repeats,
            )
            rows.append(f"{n},{p},{elapsed}")
    _maybe_write(out_file, rows)
    return rows


def weak_scaling(
    base_sizes: Sequence[int] = (1024, 1448, 2048),
    device_counts: Optional[Sequence[int]] = None,
    out_file: Optional[str] = None,
    *,
    fmt: str = "dense",
    maxiter: int = 200,
    repeats: int = 1,
) -> List[str]:
    """Weak-scaling ladders N(p) = N0 * sqrt(p), iterations fixed
    (cg.run:22-44 uses maxIter=200; work per device N^2/p constant)."""
    if device_counts is None:
        nd = len(jax.devices())
        device_counts = [p for p in (1, 2, 4, 8, 16, 32, 64) if p <= nd]
    rows = []
    for n0 in base_sizes:
        for p in device_counts:
            n = int(round(n0 * math.sqrt(p)))
            dia = lap2d_reference(n)
            mat = dia.to_dense() if fmt == "dense" else dia
            b = source_term(n)
            mesh = make_mesh(p)
            elapsed = _time_solve(
                lambda jit_eps: sharded_cg_solve(
                    mat, b * (1.0 + jit_eps), mesh=mesh, maxiter=maxiter,
                    tol=0.0,
                ).x,
                repeats,
            )
            rows.append(f"{n},{p},{elapsed}")
    _maybe_write(out_file, rows)
    return rows


def kernel_sweep(
    n: int = 10000,
    threads: Sequence[int] = (8, 32, 128, 256, 512, 1024),
    block_widths: Sequence[int] = (128, 256, 512, 1024, 4096),
    out_file: Optional[str] = None,
    *,
    dtype=None,
    repeats: int = 2,
    interpret: Optional[bool] = None,
) -> List[str]:
    """Pallas dense-kernel tile sweep (CUDA/cg.run phase-2 analogue:
    threads x BLOCK_WIDTH grid over the mat-vec kernel). Times a single
    mat-vec rather than a full solve; schema ``threads,block_width,
    seconds`` (CUDA_T.txt)."""
    import jax.numpy as jnp

    from cgx.ops.matvec import dense_matvec

    if dtype is None:
        dtype = jnp.float32
    if interpret is None:
        # Pallas TPU kernels only run interpreted on the CPU backend.
        interpret = jax.default_backend() == "cpu"
    dia = lap2d_reference(n)
    a = jnp.asarray(dia.to_dense(), dtype=dtype)
    x = jnp.asarray(source_term(n), dtype=dtype)
    itemsize = jnp.dtype(dtype).itemsize
    rows = []
    for t in threads:
        tr = max(8, min(t, n))
        for bw in block_widths:
            bc = max(128, min(bw, n))
            # VMEM feasibility: the A tile is double-buffered by the
            # pipeline; skip configurations that cannot fit (~16 MB/core)
            if 2 * tr * bc * itemsize > VMEM_BUDGET_BYTES:
                continue
            fn = lambda jit_eps: dense_matvec(
                a, x * (1.0 + jit_eps), block_rows=tr, block_cols=bc,
                interpret=interpret,
            )
            fn(0.0)  # compile
            elapsed = _time_solve(fn, repeats)
            rows.append(f"{t},{bw},{elapsed}")
    _maybe_write(out_file, rows)
    return rows


def _maybe_write(out_file: Optional[str], rows: List[str]) -> None:
    if out_file:
        with open(out_file, "a") as f:
            for row in rows:
                f.write(row + "\n")
