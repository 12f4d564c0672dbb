"""Whole-solve Pallas kernel: CG iterations entirely in VMEM.

The reference pays, per CG iteration, 6+ kernel launches and 2
device->host scalar copies (CUDA path, cg.cu:236-266); the XLA path
here already collapses that to zero launches — but its while-loop
carries still stream through HBM every iteration (~1.3 MB/iter for the
N=1e4 flagship problem).

This kernel goes the rest of the way: for banded problems whose state
fits in VMEM (bands + 4 vectors; ~40 bytes/row fp32 => N up to ~3e5
comfortably), a *chunk* of K CG iterations runs inside ONE Pallas
kernel with bands, x, r, p all VMEM-resident — per-iteration HBM
traffic is zero, and the only per-chunk costs are the launch and the
state round-trip. A host-level ``lax.while_loop`` chains chunks until
convergence, preserving the reference's exact stopping semantics
(iterations freeze once ``sqrt(rsnew) < tol``; the reported count is
reference-parity k).

Scalar state rides in a packed (1, 8) float32 SMEM vector:
  [rsold, converged, k, breakdown, unused...]
(tol/nearzero/maxiter enter via a separate read-only float32 SMEM
input). The scalar state and all reductions are float32 even for bf16
data — a bf16 iteration counter would saturate at 256 (hanging the
outer while_loop) and bf16 dot accumulation would destroy convergence.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.config import DEFAULT_TOLERANCE, NEARZERO, VMEM_BUDGET_BYTES
from cgx.ops._util import LANES, flat_shift, no_x64_trace, round_up
from cgx.ops.dia_spmv import _pad_for, _window


def vmem2d_scoped_bytes(
    ndiag: int,
    n: int,
    bands_itemsize: int,
    vec_itemsize: int,
    *,
    cols: int = 512,
    precond: bool = False,
) -> int:
    """Analytic scoped-VMEM footprint of the 2-D whole-solve kernel.

    The compiled program holds the bands plus ~10 vector units (in/out
    windows for ppad/x/r and while-loop staging; +2 scratch planes with
    precond). Calibrated against the Mosaic OOM dump at n=2.4e6 fp32
    5-band: scoped 144.78 MiB = (5 + 10) * n_p * 4 B exactly.
    Compared against :data:`cgx.config.VMEM_BUDGET_BYTES` by the kernel
    guard and the ``cgx.solve`` / refinement dispatches.
    """
    n_p = round_up(n, 8 * cols)
    vec_units = 12 if precond else 10
    return n_p * (ndiag * bands_itemsize + vec_units * vec_itemsize)
from cgx.solver.cg import CGResult


def _chunk_kernel(
    offsets, pad, n_p, chunk, precond,
    bands_ref, ppad_ref, x_ref, r_ref, scal_ref, cfg_ref,
    ppad_out, x_out, r_out, scal_out,
    *scratch,  # (cpad, inv_diag) only when precond — VMEM is precious
):
    if precond:
        cpad_scr, invd_scr = scratch
    # ppad/x/r/scal are aliased in-place (input_output_aliases). The
    # interpreter pre-fills the out refs with the input state, but the
    # TPU lowering may hand over uninitialized output buffers, so copy
    # explicitly at entry (a no-op self-copy when truly aliased) and
    # operate on the out refs from then on.
    ppad_out[:] = ppad_ref[:]
    x_out[:] = x_ref[:]
    r_out[:] = r_ref[:]
    scal_out[0, 0] = scal_ref[0, 0]
    scal_out[0, 1] = scal_ref[0, 1]
    scal_out[0, 2] = scal_ref[0, 2]
    scal_out[0, 3] = scal_ref[0, 3]
    tol = cfg_ref[0, 0]
    nearzero = cfg_ref[0, 1]
    maxiter_f = cfg_ref[0, 2]
    vec_dtype = x_out.dtype
    if precond:
        # degree-1 Neumann polynomial preconditioner M^-1 r =
        # 2 D^-1 r - D^-1 A D^-1 r (halves iterations for diagonally
        # dominant stencils at one extra in-VMEM mat-vec)
        d0 = offsets.index(0)
        cpad_scr[:] = jnp.zeros_like(cpad_scr)
        invd_scr[:] = (
            1.0 / bands_ref[d0 : d0 + 1, :].astype(jnp.float32)
        ).astype(vec_dtype)

    def matvec(buf_ref):
        # bands may ride a NARROWER dtype than the vectors (bf16 bands
        # + fp32 state halves the dominant VMEM term; stencil constants
        # like 4/-1 are bf16-exact, and inside iterative refinement a
        # rounded band is just a slightly different — still SPD —
        # inner matrix the fp64 outer corrects for)
        def band(d):
            return bands_ref[d : d + 1, :].astype(vec_dtype)

        acc = band(0) * _window(buf_ref, pad, offsets[0], n_p)
        for d, off in enumerate(offsets[1:], start=1):
            acc += band(d) * _window(buf_ref, pad, off, n_p)
        return acc

    def apply_precond(r_new):
        c = invd_scr[0:1, :] * r_new
        cpad_scr[0:1, pl.ds(pad, n_p)] = c
        ac = matvec(cpad_scr)
        return 2.0 * c - invd_scr[0:1, :] * ac

    def body(_, carry):
        rsold, converged, k, breakdown = carry
        active = jnp.logical_and(converged == 0.0, k < maxiter_f)
        # Compute unconditionally (<= chunk-1 wasted tail iterations per
        # solve); writes are predicated so frozen state stays exact.
        ap = matvec(ppad_out)
        p = ppad_out[0:1, pl.ds(pad, n_p)]
        dt = p.dtype
        conj = jnp.sum((p * ap).astype(jnp.float32))
        breakdown = jnp.where(
            jnp.logical_and(active, conj <= 0), 1.0, breakdown
        )
        alpha = (rsold / jnp.maximum(conj, rsold * nearzero)).astype(dt)
        x_new = x_out[0:1, :] + alpha * p
        r_new = r_out[0:1, :] - alpha * ap
        rr = jnp.sum((r_new * r_new).astype(jnp.float32))
        conv_now = jnp.sqrt(rr) < tol
        if precond:
            z = apply_precond(r_new)
            rsnew = jnp.sum((r_new * z).astype(jnp.float32))
            new_dir = z
        else:
            rsnew = rr
            new_dir = r_new
        beta = (rsnew / rsold).astype(dt)
        p_next = new_dir + beta * p

        @pl.when(active)
        def _():
            x_out[0:1, :] = x_new
            r_out[0:1, :] = r_new

        @pl.when(jnp.logical_and(active, jnp.logical_not(conv_now)))
        def _():
            ppad_out[0:1, pl.ds(pad, n_p)] = p_next

        advance = jnp.logical_and(active, jnp.logical_not(conv_now))
        rsold = jnp.where(advance, rsnew, rsold)
        k = jnp.where(advance, k + 1.0, k)
        converged = jnp.where(
            jnp.logical_and(active, conv_now), 1.0, converged
        )
        return rsold, converged, k, breakdown

    init = (scal_out[0, 0], scal_out[0, 1], scal_out[0, 2], scal_out[0, 3])
    rsold, converged, k, breakdown = jax.lax.fori_loop(0, chunk, body, init)
    scal_out[0, 0] = rsold
    scal_out[0, 1] = converged
    scal_out[0, 2] = k
    scal_out[0, 3] = breakdown


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "maxiter", "chunk", "interpret", "precond"),
)
@no_x64_trace
def _dia_cg_vmem(
    bands,
    b,
    tol,
    nearzero,
    *,
    offsets,
    maxiter: int,
    chunk: int,
    interpret: bool,
    precond: bool = False,
):
    dtype = b.dtype
    ndiag, n = bands.shape
    n_p = round_up(n, LANES)
    pad = _pad_for(offsets)
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n)))
    # padded diagonal entries must stay invertible for the precond path
    if precond:
        d0 = offsets.index(0)
        diag_fix = jnp.concatenate(
            [
                jnp.zeros((n,), bands.dtype),
                jnp.ones((n_p - n,), bands.dtype),
            ]
        )
        bands_p = bands_p.at[d0].add(diag_fix)
    b_p = jnp.pad(b, (0, n_p - n)).reshape(1, -1)

    # init (x0 = 0): r = b; plain CG: p = b, rsold = <b, b>;
    # PCG (Neumann-2): p = z0 = M^-1 b, rsold = <b, z0>. Scalar state is
    # float32 regardless of the data dtype (see module docstring).
    f32 = jnp.float32
    x0 = jnp.zeros((1, n_p), dtype)
    r0 = b_p
    rr0 = jnp.sum(b_p.astype(f32) * b_p.astype(f32))
    if precond:
        from cgx.solver.operators import banded_matvec

        d0 = offsets.index(0)
        inv_d = 1.0 / bands_p[d0 : d0 + 1, :].astype(dtype)
        c0 = inv_d * b_p
        z0 = (
            2.0 * c0
            - inv_d
            * banded_matvec(
                bands_p.astype(dtype), offsets, c0[0]
            ).reshape(1, -1)
        )
        p0_row = z0
        rsold0 = jnp.sum((b_p * z0).astype(f32))
    else:
        p0_row = b_p
        rsold0 = rr0
    ppad0 = jnp.pad(p0_row, ((0, 0), (pad, pad)))
    # zero initial residual would NaN alpha inside the kernel: mark
    # converged up front (see cg.py pre_conv note)
    pre_conv = jnp.where(
        jnp.logical_or(jnp.sqrt(rr0) < tol.astype(f32), rr0 == 0), 1.0, 0.0
    ).astype(f32)
    scal0 = jnp.stack(
        [rsold0, pre_conv, jnp.zeros((), f32), jnp.zeros((), f32)]
    ).reshape(1, 4)
    scal0 = jnp.pad(scal0, ((0, 0), (0, 4)))
    cfg = jnp.stack(
        [tol.astype(f32), nearzero.astype(f32), jnp.asarray(maxiter, f32)]
    ).reshape(1, 3)

    kernel = pl.pallas_call(
        functools.partial(_chunk_kernel, offsets, pad, n_p, chunk, precond),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bands
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ppad
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cfg
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(ppad0.shape, dtype),
            jax.ShapeDtypeStruct((1, n_p), dtype),
            jax.ShapeDtypeStruct((1, n_p), dtype),
            jax.ShapeDtypeStruct((1, 8), f32),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        scratch_shapes=(
            [
                pltpu.VMEM((1, n_p + 2 * pad), dtype),  # cpad
                pltpu.VMEM((1, n_p), dtype),  # inv_diag
            ]
            if precond
            else []
        ),
        interpret=interpret,
        # Mosaic's default VMEM window rejects state above ~16 MB;
        # v5e/v5p cores carry 128 MB, so lift the limit and let the
        # whole-solve kernel cover N up to ~2e6 fp32 (the dispatch
        # budget in cgx.config gates what actually uses it)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )

    def cond(state):
        ppad, x, r, scal = state
        return jnp.logical_and(scal[0, 1] == 0.0, scal[0, 2] < maxiter)

    def body(state):
        ppad, x, r, scal = state
        return kernel(bands_p, ppad, x, r, scal, cfg)

    ppad, x, r, scal = jax.lax.while_loop(cond, body, (ppad0, x0, r0, scal0))
    rsnew = jnp.sum(r.astype(f32) * r.astype(f32))
    return CGResult(
        x=x[0, :n],
        iterations=scal[0, 2].astype(jnp.int32),
        residual_norm=jnp.sqrt(rsnew),
        converged=scal[0, 1] == 1.0,
        rsold=scal[0, 0],
        history=jnp.zeros((0,), dtype),
        breakdown=scal[0, 3] == 1.0,
    )


def _shift_plane(ref, base_rows: int, off: int, rows: int, cols: int):
    """flat_shift over a resident VMEM plane ref (interior starts at
    row ``base_rows``)."""
    return flat_shift(
        lambda r0, nr: ref[pl.ds(r0, nr), :], base_rows, off, rows, cols
    )


def _chunk_kernel2d(
    offsets, p_rows, rows_p, cols, chunk, precond,
    bands_ref, ppad_ref, x_ref, r_ref, scal_ref, cfg_ref,
    ppad_out, x_out, r_out, scal_out,
    *scratch,  # (cpad, inv_diag) only when precond
):
    if precond:
        cpad_scr, invd_scr = scratch
    # see _chunk_kernel: copy-on-entry makes the aliasing explicit
    ppad_out[:] = ppad_ref[:]
    x_out[:] = x_ref[:]
    r_out[:] = r_ref[:]
    for i in range(4):
        scal_out[0, i] = scal_ref[0, i]
    tol = cfg_ref[0, 0]
    nearzero = cfg_ref[0, 1]
    maxiter_f = cfg_ref[0, 2]
    vec_dtype = x_out.dtype
    if precond:
        d0 = offsets.index(0)
        cpad_scr[:] = jnp.zeros_like(cpad_scr)
        invd_scr[:] = (
            1.0 / bands_ref[d0].astype(jnp.float32)
        ).astype(vec_dtype)

    def matvec(plane_ref):
        def band(d):
            return bands_ref[d].astype(vec_dtype)

        acc = band(0) * _shift_plane(
            plane_ref, p_rows, offsets[0], rows_p, cols
        )
        for d, off in enumerate(offsets[1:], start=1):
            acc += band(d) * _shift_plane(
                plane_ref, p_rows, off, rows_p, cols
            )
        return acc

    def apply_precond(r_new):
        c = invd_scr[:, :] * r_new
        cpad_scr[pl.ds(p_rows, rows_p), :] = c
        ac = matvec(cpad_scr)
        return 2.0 * c - invd_scr[:, :] * ac

    def body(_, carry):
        rsold, converged, k, breakdown = carry
        active = jnp.logical_and(converged == 0.0, k < maxiter_f)
        ap = matvec(ppad_out)
        p = ppad_out[pl.ds(p_rows, rows_p), :]
        dt = p.dtype
        conj = jnp.sum((p * ap).astype(jnp.float32))
        breakdown = jnp.where(
            jnp.logical_and(active, conj <= 0), 1.0, breakdown
        )
        alpha = (rsold / jnp.maximum(conj, rsold * nearzero)).astype(dt)
        x_new = x_out[:, :] + alpha * p
        r_new = r_out[:, :] - alpha * ap
        rr = jnp.sum((r_new * r_new).astype(jnp.float32))
        conv_now = jnp.sqrt(rr) < tol
        if precond:
            z = apply_precond(r_new)
            rsnew = jnp.sum((r_new * z).astype(jnp.float32))
            new_dir = z
        else:
            rsnew = rr
            new_dir = r_new
        beta = (rsnew / rsold).astype(dt)
        p_next = new_dir + beta * p

        @pl.when(active)
        def _():
            x_out[:, :] = x_new
            r_out[:, :] = r_new

        @pl.when(jnp.logical_and(active, jnp.logical_not(conv_now)))
        def _():
            ppad_out[pl.ds(p_rows, rows_p), :] = p_next

        advance = jnp.logical_and(active, jnp.logical_not(conv_now))
        rsold = jnp.where(advance, rsnew, rsold)
        k = jnp.where(advance, k + 1.0, k)
        converged = jnp.where(
            jnp.logical_and(active, conv_now), 1.0, converged
        )
        return rsold, converged, k, breakdown

    init = (scal_out[0, 0], scal_out[0, 1], scal_out[0, 2], scal_out[0, 3])
    rsold, converged, k, breakdown = jax.lax.fori_loop(0, chunk, body, init)
    scal_out[0, 0] = rsold
    scal_out[0, 1] = converged
    scal_out[0, 2] = k
    scal_out[0, 3] = breakdown


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "maxiter", "chunk", "cols", "interpret", "precond"
    ),
)
@no_x64_trace
def _dia_cg_vmem2d(
    bands,
    b,
    tol,
    nearzero,
    *,
    offsets,
    maxiter: int,
    chunk: int,
    cols: int,
    interpret: bool,
    precond: bool = False,
):
    dtype = b.dtype
    ndiag, n = bands.shape
    n_p = round_up(n, 8 * cols)
    rows_p = n_p // cols
    p_rows = max(abs(o) // cols + 1 for o in offsets)
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n)))
    if precond:
        d0 = offsets.index(0)
        diag_fix = jnp.concatenate(
            [
                jnp.zeros((n,), bands.dtype),
                jnp.ones((n_p - n,), bands.dtype),
            ]
        )
        bands_p = bands_p.at[d0].add(diag_fix)
    b_p = jnp.pad(b, (0, n_p - n))

    f32 = jnp.float32
    rr0 = jnp.sum(b_p.astype(f32) * b_p.astype(f32))
    if precond:
        from cgx.solver.operators import banded_matvec

        d0 = offsets.index(0)
        inv_d = 1.0 / bands_p[d0].astype(dtype)
        c0 = inv_d * b_p
        z0 = 2.0 * c0 - inv_d * banded_matvec(
            bands_p.astype(dtype), offsets, c0
        )
        p0_flat = z0
        rsold0 = jnp.sum((b_p * z0).astype(f32))
    else:
        p0_flat = b_p
        rsold0 = rr0
    x0 = jnp.zeros((rows_p, cols), dtype)
    r0 = b_p.reshape(rows_p, cols)
    ppad0 = jnp.pad(
        p0_flat.reshape(rows_p, cols), ((p_rows, p_rows), (0, 0))
    )
    pre_conv = jnp.where(
        jnp.logical_or(jnp.sqrt(rr0) < tol.astype(f32), rr0 == 0), 1.0, 0.0
    ).astype(f32)
    scal0 = jnp.stack(
        [rsold0, pre_conv, jnp.zeros((), f32), jnp.zeros((), f32)]
    ).reshape(1, 4)
    scal0 = jnp.pad(scal0, ((0, 0), (0, 4)))
    cfg = jnp.stack(
        [tol.astype(f32), nearzero.astype(f32), jnp.asarray(maxiter, f32)]
    ).reshape(1, 3)
    bands_pl = bands_p.reshape(ndiag, rows_p, cols)

    kernel = pl.pallas_call(
        functools.partial(
            _chunk_kernel2d, offsets, p_rows, rows_p, cols, chunk, precond
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bands
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ppad
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cfg
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(ppad0.shape, dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((1, 8), f32),
        ),
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
        scratch_shapes=(
            [
                pltpu.VMEM((rows_p + 2 * p_rows, cols), dtype),  # cpad
                pltpu.VMEM((rows_p, cols), dtype),  # inv_diag
            ]
            if precond
            else []
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
    )

    def cond(state):
        ppad, x, r, scal = state
        return jnp.logical_and(scal[0, 1] == 0.0, scal[0, 2] < maxiter)

    def body(state):
        ppad, x, r, scal = state
        return kernel(bands_pl, ppad, x, r, scal, cfg)

    ppad, x, r, scal = jax.lax.while_loop(cond, body, (ppad0, x0, r0, scal0))
    rsnew = jnp.sum(r.astype(f32) * r.astype(f32))
    return CGResult(
        x=x.reshape(-1)[:n],
        iterations=scal[0, 2].astype(jnp.int32),
        residual_norm=jnp.sqrt(rsnew),
        converged=scal[0, 1] == 1.0,
        rsold=scal[0, 0],
        history=jnp.zeros((0,), dtype),
        breakdown=scal[0, 3] == 1.0,
    )


def dia_cg_solve_vmem(
    op,
    b: jnp.ndarray,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    chunk: int = 64,
    interpret: bool = False,
    precond: bool = False,
    bands_dtype=None,
    layout: str = "1d",
    cols: int = 512,
) -> CGResult:
    """CG on a banded operator with all state VMEM-resident.

    ``op`` is a :class:`cgx.solver.operators.DiaOperator` (fp32/bf16).
    VMEM budget: (ndiag + 4) * N * itemsize + padding must fit in
    ~16 MB — N up to roughly 4e5 at fp32 for 5-diagonal stencils.
    ``precond=True`` runs PCG with the in-kernel degree-1 Neumann
    polynomial preconditioner (one extra in-VMEM mat-vec per iteration,
    ~half the iterations for diagonally dominant stencils). Note: with
    precond the ``rsold`` field holds <r, z>, not <r, r>.

    ``layout='2d'`` stores every vector as a row-major (n/cols, cols)
    plane instead of (1, n): full (8, 128) vreg occupancy for all VPU
    work (the (1, n) layout leaves 7 of 8 sublanes idle) and a tiling
    Mosaic accepts at much larger state — the (1, n) layout is
    rejected at ~37 MB while the plane layout compiles to the VMEM
    capacity. Diagonal shifts decompose as off = q*cols + s (row
    offset free, lane roll for s — cf. dia_matvec_stream2d).
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    bands = op.bands
    if bands_dtype is not None:
        # bands in a NARROWER dtype than the vectors (e.g. bfloat16):
        # halves the dominant VMEM term so the whole-solve kernel
        # reaches ~2x larger N. Stencil constants like 4/-1 are
        # bf16-exact; for general bands this solves a slightly
        # perturbed (still SPD) system — fine as the inner of
        # iterative refinement, NOT for direct tight-tolerance use.
        bands = bands.astype(bands_dtype)
    if layout == "2d":
        # Analytic capacity guard. Fail fast with a pointer to the
        # streaming kernel instead of a Mosaic "Ran out of memory in
        # memory space vmem" (hardware-validated: n=2.0e6 fp32 5-band
        # compiles and runs at 48.6 us/iter; n=2.4e6 OOMs the chip —
        # results/hw_queue_r2s8/newkernels3).
        est = vmem2d_scoped_bytes(
            op.bands.shape[0], n,
            jnp.dtype(bands.dtype).itemsize, jnp.dtype(b.dtype).itemsize,
            cols=cols, precond=precond,
        )
        if not interpret and est > VMEM_BUDGET_BYTES:
            raise ValueError(
                f"dia_cg_solve_vmem(layout='2d'): estimated scoped VMEM "
                f"{est / 2**20:.0f} MiB exceeds the "
                f"{VMEM_BUDGET_BYTES / 2**20:.0f} MiB budget at "
                f"n={n} ({op.bands.shape[0]} bands, "
                f"{jnp.dtype(b.dtype).name}); use "
                f"cgx.ops.cg_stream.dia_cg_solve_stream (HBM-streaming "
                f"fused iteration) for state above the VMEM ceiling"
            )
        return _dia_cg_vmem2d(
            bands,
            b,
            jnp.asarray(tol, b.dtype),
            jnp.asarray(nearzero, b.dtype),
            offsets=tuple(op.offsets),
            maxiter=int(maxiter),
            chunk=int(chunk),
            cols=int(cols),
            interpret=bool(interpret),
            precond=bool(precond),
        )
    if layout != "1d":
        raise ValueError(f"unknown layout {layout!r}")
    return _dia_cg_vmem(
        bands,
        b,
        jnp.asarray(tol, b.dtype),
        jnp.asarray(nearzero, b.dtype),
        offsets=tuple(op.offsets),
        maxiter=int(maxiter),
        chunk=int(chunk),
        interpret=bool(interpret),
        precond=bool(precond),
    )
