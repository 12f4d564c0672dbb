"""Fully fused streaming s-step CG: s iterations per ~2 passes over HBM.

Round-3 VERDICT stretch item. The streaming CG kernel
(cgx.ops.cg_stream) moves 15N words per iteration — r/w/s planes read
and written, bands read, p/x read and written — and measures at 49-53%
of HBM peak; its traffic is irreducible per-iteration. s-step CG
(cgx.solver.sstep) changes the SHAPE of the work: per outer block it
needs the Krylov basis only twice — once to form the Gram matrix, once
to recover x/r/p from coefficients. The matrix-powers kernel
(cgx.ops.dia_powers) already builds the basis in one band pass, but it
WRITES the (2s+1)N-word basis to HBM, the Gram reads it back, and the
recovery reads it a third time: measured 887.7 us/iter at N=4e6 vs the
plain stream kernel's 566.6 (BENCHMARKS session 8-10).

This module deletes the basis from HBM entirely, at the classic
matrix-powers price of computing it twice:

  kernel 1 (gram):    stream bands+p+r once, generate the basis
                      block-locally in VMEM, accumulate G = V V^T on
                      the fly. HBM: read (ndiag+2)N. Write: (2s+1)^2
                      scalars.
  (host-free XLA)     replay s CG iterations in coefficient space
                      (cgx.solver.sstep.replay_block — tiny).
  kernel 2 (recover): stream bands+p+r (again) + x, regenerate the
                      basis block-locally, write the three
                      coefficient combinations x/r/p.
                      HBM: read (ndiag+3)N, write 3N.

Analytic traffic per s iterations: (2*ndiag + 8)N words + halo
surcharge, vs the stream kernel's 15sN — at s=4 that is 4.5N/iter
(3.3x less) and at s=8, 2.25N/iter (6.7x). The redundant basis
generation doubles VPU work per pass; sessions 9-10 measured in-kernel
VPU compute largely overlapped behind DMA at 15N-word traffic, so the
compute/DMA balance flips somewhere — where, exactly, is what the
hardware race (scripts/sstep_stream_race.py) measures.

Numerics are byte-identical in STRUCTURE to cgx.solver.sstep: same
Chebyshev basis (three-term recurrence on the Lanczos interval), same
Gram-space replay (shared code, replay_block), same reference
break/freeze semantics. The two kernel-generated basis copies are
bit-identical to each other (same instructions, same data), so the
Gram and the recovery see ONE consistent basis.

p/r live as halo'd planes across the whole solve (the kernels read
them with their halo and write them back with zeroed halo rows);
nothing is re-padded per block. The tail rows of the padded planes
(n..n_p) stay exactly zero through the recurrence because the band
planes are zero-padded there — every generated tail value is 0*x = 0 —
so the Gram needs no masking (same invariant dia_powers relies on).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops._util import no_x64_trace, plane_matvec
from cgx.ops.dia_powers import _powers_geometry, sstep_powers_band_planes
from cgx.ops.tw32 import two_sum32
from cgx.solver.cg import CGResult


def _gen_basis(
    vbuf, offsets, wp, wr, theta, delta, shifts,
    m_rows, p_halo, rows, cols, slot, pslab, rslab, bslab, ta, tb, dtype,
):
    """Generate the (wp + wr) central basis planes into ``vbuf`` from
    the halo'd p/r slabs — the gen() of cgx.ops.dia_powers._powers_kernel
    with the output retargeted at a VMEM scratch (kept in lockstep with
    that tested original; oracle-equality is pinned via the Gram in
    tests/test_sstep_stream.py)."""
    r2p = rows + 2 * p_halo
    th = jnp.asarray(theta, dtype)
    dl = jnp.asarray(delta, dtype)
    sg = jnp.asarray(delta / 2.0, dtype)
    sh = [jnp.asarray(v, dtype) for v in shifts]

    def matvec(v_full):
        # per-band widen: the band slabs may stream in a narrower
        # storage dtype (bf16 planes, bands_dtype) — the VPU convert is
        # free next to the multiply and the basis stays full-precision
        # (bitwise equal to f32 planes when the values are bf16-exact)
        return plane_matvec(
            lambda d: bslab[slot, d, pl.ds(m_rows, r2p), :].astype(dtype),
            v_full, offsets, m_rows, r2p, cols,
        )

    def slab_loader(slab):
        def load(r0, nr):
            return slab[slot, pl.ds(r0, nr), :]

        return load

    def buf_loader(buf):
        def load(r0, nr):
            return buf[pl.ds(r0, nr), :]

        return load

    def gen(src_slab, width: int, base_idx: int):
        load0 = slab_loader(src_slab)
        vbuf[base_idx] = src_slab[slot, pl.ds(m_rows + p_halo, rows), :]
        if width == 1:
            return
        t0c = load0(m_rows, r2p)
        v0 = src_slab[slot]
        if sh:
            t1 = (matvec(v0) - sh[0] * t0c) / sg
        else:
            t1 = (matvec(v0) - th * t0c) / dl
        ta[pl.ds(m_rows, r2p), :] = t1
        vbuf[base_idx + 1] = t1[p_halo : p_halo + rows, :]
        prev_load, cur = load0, ta
        for i in range(2, width):
            cur_load = buf_loader(cur)
            mvv = matvec(cur[...])
            tcur = cur_load(m_rows, r2p)
            if sh:
                ti = (mvv - sh[i - 1] * tcur) / sg
            else:
                ti = 2.0 * (mvv - th * tcur) / dl - prev_load(m_rows, r2p)
            nxt = tb if cur is ta else ta
            nxt[pl.ds(m_rows, r2p), :] = ti
            vbuf[base_idx + i] = ti[p_halo : p_halo + rows, :]
            prev_load, cur = cur_load, nxt

    gen(pslab, wp, 0)
    gen(rslab, wr, wp)


def _in_copies(jj, slot, height, rows, p_hbm, r_hbm, bands_hbm,
               pslab, rslab, bslab, sems):
    return (
        pltpu.make_async_copy(
            p_hbm.at[pl.ds(jj * rows, height), :], pslab.at[slot],
            sems.at[slot, 0],
        ),
        pltpu.make_async_copy(
            r_hbm.at[pl.ds(jj * rows, height), :], rslab.at[slot],
            sems.at[slot, 1],
        ),
        pltpu.make_async_copy(
            bands_hbm.at[:, pl.ds(jj * rows, height), :], bslab.at[slot],
            sems.at[slot, 2],
        ),
    )


def _gram_kernel(
    offsets: Tuple[int, ...],
    wp: int,
    wr: int,
    theta: float,
    delta: float,
    shifts: Tuple[float, ...],
    m_rows: int,
    p_halo: int,
    rows: int,
    cols: int,
    # inputs (ANY)
    p_hbm, r_hbm, bands_hbm,
    # output
    gram_ref,  # SMEM (m, m) f32: scalar-accumulated across grid steps
    # scratch
    vbuf, pslab, rslab, bslab, ta, tb, sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = rows + 2 * (p_halo + m_rows)

    def copies(jj, slot):
        return _in_copies(jj, slot, height, rows, p_hbm, r_hbm,
                          bands_hbm, pslab, rslab, bslab, sems)

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(j + 1 < nb)
    def _():
        for c in copies(j + 1, (j + 1) % 2):
            c.start()

    for c in copies(j, j % 2):
        c.wait()
    slot = j % 2

    dtype = vbuf.dtype
    _gen_basis(vbuf, offsets, wp, wr, theta, delta, shifts,
               m_rows, p_halo, rows, cols, slot, pslab, rslab, bslab,
               ta, tb, dtype)

    m = wp + wr
    f32 = jnp.float32
    # m(m+1)/2 multiply+reduce pairs, accumulated SCALAR-WISE into the
    # SMEM output (the dots_ref pattern of cg_stream._iter_kernel).
    # Mosaic lowers neither a two-contracting-dims dot_general nor the
    # scatter from building a small matrix with .at[].set (both
    # measured: results/hw_queue_r3/sstep_stream_race.log), and a
    # reshape to (m, rows*cols) is a lane relayout; the 45 pair
    # reductions at m=9 are ~12 Mflop/block, noise next to the basis
    # generation.
    #
    # Cross-block accumulation is DOUBLE-f32 (gram_ref[0]=hi,
    # gram_ref[1]=lo, Knuth two_sum per block): plain f32 `+=` grows
    # the Gram error linearly in the block count — eps*nb/2 relative,
    # ~2.3e-6 at N=1e7/77 blocks — which the coefficient replay
    # amplifies by kappa(G) into the measured s=4 breakdown
    # (results/hw_queue_r3/sstep_envelope3.log). two_sum on SMEM
    # scalars is free next to the plane reductions; the remaining
    # error is the per-block tree-sum rounding, which does NOT grow
    # with N (random-sign combination across blocks). f32 two_sum is
    # valid on this chip (f32 is correctly rounded; fp64 is not).
    @pl.when(j == 0)
    def _():
        for i in range(m):
            for jj in range(m):
                gram_ref[0, i, jj] = jnp.zeros((), f32)
                gram_ref[1, i, jj] = jnp.zeros((), f32)

    vals = [vbuf[i].astype(f32) for i in range(m)]
    for i in range(m):
        for jj in range(i, m):
            pij = jnp.sum(vals[i] * vals[jj])
            hi, err = two_sum32(gram_ref[0, i, jj], pij)
            gram_ref[0, i, jj] = hi
            gram_ref[1, i, jj] += err
            if jj > i:
                hi2, err2 = two_sum32(gram_ref[0, jj, i], pij)
                gram_ref[0, jj, i] = hi2
                gram_ref[1, jj, i] += err2


def _recover_kernel(
    offsets: Tuple[int, ...],
    wp: int,
    wr: int,
    theta: float,
    delta: float,
    shifts: Tuple[float, ...],
    m_rows: int,
    p_halo: int,
    rows: int,
    cols: int,
    # inputs
    p_hbm, r_hbm, bands_hbm,  # ANY
    x_ref,  # auto VMEM block (rows, cols)
    coef_ref,  # SMEM (3, m): [xc, d, c]
    # outputs
    x_out,  # auto VMEM block
    r_out, p_out,  # halo'd planes, ANY (manual DMA)
    # scratch
    vbuf, pslab, rslab, bslab, ta, tb, stage, zrow, sems, out_sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    pm = p_halo + m_rows
    height = rows + 2 * pm

    def copies(jj, slot):
        return _in_copies(jj, slot, height, rows, p_hbm, r_hbm,
                          bands_hbm, pslab, rslab, bslab, sems)

    @pl.when(j == 0)
    def _():
        for c in copies(0, 0):
            c.start()
        # zero the halo rows of the fresh output planes so the next
        # block's gram kernel reads correct padding
        zrow[:, :] = jnp.zeros_like(zrow)
        zcopies = []
        for t, out in enumerate((r_out, p_out)):
            zcopies.append(pltpu.make_async_copy(
                zrow, out.at[pl.ds(0, pm), :], out_sems.at[0, t]
            ))
            zcopies.append(pltpu.make_async_copy(
                zrow, out.at[pl.ds(pm + nb * rows, pm), :],
                out_sems.at[1, t],
            ))
        for c in zcopies:
            c.start()
        for c in zcopies:
            c.wait()

    @pl.when(j + 1 < nb)
    def _():
        for c in copies(j + 1, (j + 1) % 2):
            c.start()

    @pl.when(j == 0)
    def _():
        # in-place aliasing: block j's p/r output writes overlap block
        # j+1's input halo by pm rows, so the j+1 prefetch is waited
        # BEFORE this block's output DMA starts (below); only step 0
        # waits its own input here (cf. cg_stream._iter_kernel)
        for c in copies(0, 0):
            c.wait()
    slot = j % 2

    dtype = vbuf.dtype
    _gen_basis(vbuf, offsets, wp, wr, theta, delta, shifts,
               m_rows, p_halo, rows, cols, slot, pslab, rslab, bslab,
               ta, tb, dtype)

    m = wp + wr
    # three coefficient combinations over the basis planes
    x_acc = x_ref[:, :]
    r_acc = jnp.zeros((rows, cols), dtype)
    p_acc = jnp.zeros((rows, cols), dtype)
    for i in range(m):
        vi = vbuf[i]
        x_acc = x_acc + coef_ref[0, i] * vi
        r_acc = r_acc + coef_ref[1, i] * vi
        p_acc = p_acc + coef_ref[2, i] * vi
    x_out[:, :] = x_acc

    def out_copies(jj, oslot):
        return (
            pltpu.make_async_copy(
                stage.at[oslot, 0],
                r_out.at[pl.ds(pm + jj * rows, rows), :],
                out_sems.at[oslot, 0],
            ),
            pltpu.make_async_copy(
                stage.at[oslot, 1],
                p_out.at[pl.ds(pm + jj * rows, rows), :],
                out_sems.at[oslot, 1],
            ),
        )

    # in-place safety: complete the j+1 prefetch before overwriting
    # the rows it reads
    @pl.when(j + 1 < nb)
    def _():
        for c in copies(j + 1, (j + 1) % 2):
            c.wait()

    @pl.when(j >= 2)
    def _():
        for c in out_copies(j - 2, j % 2):
            c.wait()

    stage[j % 2, 0] = r_acc
    stage[j % 2, 1] = p_acc
    for c in out_copies(j, j % 2):
        c.start()

    @pl.when(j == nb - 1)
    def _():
        if nb >= 2:
            for c in out_copies(j - 1, (j - 1) % 2):
                c.wait()
        for c in out_copies(j, j % 2):
            c.wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "s", "theta", "delta", "shifts", "rows", "cols",
        "interpret",
    ),
)
@no_x64_trace
def _sstep_gram(
    bands_pl, p_pl, r_pl, *,
    offsets, s, theta, delta, shifts, rows, cols, interpret,
):
    ndiag = bands_pl.shape[0]
    dtype = p_pl.dtype
    bdt = bands_pl.dtype
    wp, wr = s + 1, s
    m = 2 * s + 1
    # margins/heights depend only on (offsets, s, rows, cols, dtype) —
    # the n argument only sets n_p, unused here (block count comes from
    # the plane shape). Alignment follows the NARROWEST streamed dtype
    # (bf16 band planes need 16-row-aligned DMA slices; a multiple of
    # 16 is also 8-aligned for the f32 state slabs).
    align = bdt if jnp.dtype(bdt).itemsize < jnp.dtype(dtype).itemsize \
        else dtype
    _, _, p_halo, m_rows, pm, height = _powers_geometry(
        offsets, s, rows, cols, align, rows * cols
    )
    total_rows = p_pl.shape[0]
    nb = (total_rows - 2 * pm) // rows
    grid = (nb,)
    return pl.pallas_call(
        functools.partial(
            _gram_kernel, offsets, wp, wr, theta, delta, tuple(shifts),
            m_rows, p_halo, rows, cols,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # p halo'd plane
            pl.BlockSpec(memory_space=pl.ANY),  # r halo'd plane
            pl.BlockSpec(memory_space=pl.ANY),  # band planes
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        # (hi, lo) double-f32 pair — the caller folds g = hi + lo (one
        # final rounding, eps-relative) before the coefficient replay
        out_shape=jax.ShapeDtypeStruct((2, m, m), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, rows, cols), dtype),                     # vbuf
            pltpu.VMEM((2, height, cols), dtype),                   # pslab
            pltpu.VMEM((2, height, cols), dtype),                   # rslab
            pltpu.VMEM((2, ndiag, height, cols), bdt),              # bslab
            pltpu.VMEM((height, cols), dtype),                      # ta
            pltpu.VMEM((height, cols), dtype),                      # tb
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * s * (2 * ndiag + 4) + m * m) * nb * rows * cols,
            bytes_accessed=(2 * dtype.itemsize + ndiag * bdt.itemsize)
            * nb * rows * cols,
            transcendentals=0,
        ),
    )(p_pl, r_pl, bands_pl)


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "s", "theta", "delta", "shifts", "rows", "cols",
        "interpret",
    ),
)
@no_x64_trace
def _sstep_recover(
    bands_pl, p_pl, r_pl, x, coef, *,
    offsets, s, theta, delta, shifts, rows, cols, interpret,
):
    ndiag = bands_pl.shape[0]
    dtype = p_pl.dtype
    bdt = bands_pl.dtype
    wp, wr = s + 1, s
    m = 2 * s + 1
    align = bdt if jnp.dtype(bdt).itemsize < jnp.dtype(dtype).itemsize \
        else dtype
    _, _, p_halo, m_rows, pm, height = _powers_geometry(
        offsets, s, rows, cols, align, rows * cols
    )
    if pm > rows:
        raise ValueError(
            f"recover kernel in-place hazard: halo+margin pm={pm} rows "
            f"exceeds the block height rows={rows}; block j's aliased "
            "p/r output would overwrite halo rows block j+2 still reads "
            "(ordered only against j+1). Grow rows to >= pm — "
            "dia_sstep_stream_solve does this automatically."
        )
    total_rows = p_pl.shape[0]
    nb = (total_rows - 2 * pm) // rows
    rows_p = nb * rows
    grid = (nb,)
    return pl.pallas_call(
        functools.partial(
            _recover_kernel, offsets, wp, wr, theta, delta,
            tuple(shifts), m_rows, p_halo, rows, cols,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # p halo'd plane
            pl.BlockSpec(memory_space=pl.ANY),  # r halo'd plane
            pl.BlockSpec(memory_space=pl.ANY),  # band planes
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coef (3, m)
        ],
        out_specs=(
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # x_out
            pl.BlockSpec(memory_space=pl.ANY),  # r_out halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # p_out halo'd
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct(r_pl.shape, dtype),
            jax.ShapeDtypeStruct(p_pl.shape, dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, rows, cols), dtype),                     # vbuf
            pltpu.VMEM((2, height, cols), dtype),                   # pslab
            pltpu.VMEM((2, height, cols), dtype),                   # rslab
            pltpu.VMEM((2, ndiag, height, cols), bdt),              # bslab
            pltpu.VMEM((height, cols), dtype),                      # ta
            pltpu.VMEM((height, cols), dtype),                      # tb
            pltpu.VMEM((2, 2, rows, cols), dtype),                  # stage
            pltpu.VMEM((pm, cols), dtype),                          # zrow
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        # alias x/r/p inputs onto the outputs: without this XLA copies
        # all three carries back every block (same pathology profiled
        # on the stream kernel, results/hw_queue_r3/profile_attempt)
        input_output_aliases={3: 0, 1: 1, 0: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * s * (2 * ndiag + 4) + 6 * m) * nb * rows * cols,
            bytes_accessed=(6 * dtype.itemsize + ndiag * bdt.itemsize)
            * nb * rows * cols,
            transcendentals=0,
        ),
    )(p_pl, r_pl, bands_pl, x, coef)


def dia_sstep_stream_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    s: int = 4,
    bounds: Optional[Tuple[float, float]] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    basis: str = "chebyshev",
    rows: int = 512,
    cols: int = 512,
    bands_dtype="auto",
    interpret: bool = False,
) -> CGResult:
    """s-step CG with the fused two-kernel streaming block (module
    docstring): the Krylov basis never touches HBM.

    Tile default rows=512: the trusted round-5 shape race
    (results/sstep_shape_table.txt) has 512x512 fastest-or-equal at
    both race sizes — 419.9 us/iter bf16 at N=1.024e7 vs 456.2 for
    256 rows (and equal within noise at N=4e6).

    Matches :func:`cgx.solver.sstep.sstep_cg_solve` semantics
    (Chebyshev/Newton basis, reference break/freeze replay — shared
    ``replay_block``); banded fp32/bf16 DIA operators only.

    fp32 basis-conditioning limit: kappa(V)^2 must stay below 1/eps32,
    which caps s at ~6 for Laplacian-like spectra (measured: at s=8
    fp32 the coefficient replay is breakdown-sensitive to mere Gram
    reassociation — the same instability lurks in sstep_cg_solve
    there; fp64's s<=8 limit from the sstep docstring does not
    transfer). Default s=4 is safely inside.

    ``bands_dtype``: storage dtype for the streamed band planes.
    ``'auto'`` (default) narrows to bf16 exactly when every band value
    round-trips bf16 bit-for-bit (lap2d/lap3d unit stencils do) — the
    kernels widen per-band on load, so the recurrence is BITWISE
    unchanged while the band share of the block's HBM traffic
    (2*ndiag of 2*ndiag+8 words) halves. Pass ``None`` to force
    full-width planes, or an explicit dtype to round the operator
    (then the rounded operator is used consistently, including the
    initial residual — cf. dia_cg_solve_stream).
    """
    from cgx.solver.chebyshev import spectral_bounds
    from cgx.solver.operators import DiaOperator
    from cgx.solver.sstep import _basis_matrix, newton_shifts

    if not isinstance(a, DiaOperator):
        raise TypeError("dia_sstep_stream_solve needs a DiaOperator")
    if a.dtype == jnp.float64 and not interpret:
        raise TypeError(
            "the fused s-step stream has no fp64 TPU lowering; use "
            "sstep_cg_solve(powers='off') for fp64"
        )
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if bounds is None:
        bounds = spectral_bounds(a, n)
    lmin, lmax = float(bounds[0]), float(bounds[1])
    if not (0 < lmin < lmax):
        raise ValueError(f"invalid spectral bounds {bounds}")
    theta = (lmax + lmin) / 2.0
    delta = (lmax - lmin) / 2.0
    if basis == "newton":
        shifts = newton_shifts(a, n, int(s), (lmin, lmax))
    elif basis == "chebyshev":
        shifts = ()
    else:
        raise ValueError(f"unknown s-step basis {basis!r}")

    if isinstance(bands_dtype, str) and bands_dtype == "auto":
        exact = bool(jnp.all(
            a.bands.astype(jnp.bfloat16).astype(a.dtype) == a.bands
        ))
        bands_dtype = jnp.bfloat16 if exact else None
    align = a.dtype
    if bands_dtype is not None:
        bands_dtype = jnp.dtype(bands_dtype)
        if bands_dtype.itemsize < jnp.dtype(a.dtype).itemsize:
            align = bands_dtype

    # In-place aliasing safety (advisor r3, high): the recover kernel
    # writes block j's interior rows [pm + j*rows, pm + (j+1)*rows)
    # over the SAME buffer later blocks still read old p/r halo data
    # from. The 2-deep staged pipeline only orders block j's write
    # against block j+1's prefetch, so correctness requires block j+2's
    # read window [(j+2)*rows, ...) to start at or after j's write end,
    # i.e. rows >= pm. pm depends on (offsets, s, cols, dtype) only, so
    # auto-grow rows (pm is already sublane-aligned) when the operator
    # reaches further than the requested tile — e.g. lap3d at large
    # grids, where offsets exceed rows*cols.
    # DMA offsets are j*rows on every streamed plane, so rows must be
    # aligned to the narrowest dtype's sublane tile (16 for bf16 band
    # planes) — round up, never down (tile choice only, not semantics)
    from cgx.ops._util import round_up, sublanes

    rows = round_up(int(rows), sublanes(align))
    _, _, _, _, pm, _ = _powers_geometry(
        tuple(a.offsets), int(s), rows, int(cols), align, n
    )
    if pm > rows:
        rows = pm

    # Exact power-of-2 RHS prescale (see pow2_rhs_scale): the replay's
    # products of Gram entries overflow f32 for huge-norm b (the
    # reference source term at N~1e7); bitwise no-op otherwise.
    from cgx.ops._util import pow2_rhs_scale

    x0 = jnp.zeros_like(b) if x0 is None else x0
    down, up = pow2_rhs_scale(b, x0)
    res = _sstep_stream_loop(
        a.bands, b * down,
        x0 * down,
        jnp.asarray(tol, jnp.float32) * down.astype(jnp.float32),
        jnp.asarray(nearzero, jnp.float32),
        offsets=tuple(a.offsets),
        s=int(s),
        maxiter=int(maxiter),
        theta=theta,
        delta=delta,
        shifts=tuple(shifts),
        rows=int(rows),
        cols=int(cols),
        bands_dtype=(
            None if bands_dtype is None else jnp.dtype(bands_dtype).name
        ),
        interpret=bool(interpret),
    )
    return res._replace(
        x=res.x * up,
        residual_norm=res.residual_norm * up.astype(res.residual_norm.dtype),
        rsold=res.rsold * (up * up).astype(res.rsold.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "s", "maxiter", "theta", "delta", "shifts", "rows",
        "cols", "bands_dtype", "interpret",
    ),
)
def _sstep_stream_loop(
    bands, b, x0, tol, nearzero, *,
    offsets, s, maxiter, theta, delta, shifts, rows, cols, interpret,
    bands_dtype=None,
):
    from cgx.solver.operators import banded_matvec
    from cgx.solver.sstep import _basis_matrix, replay_block

    dtype = b.dtype
    f32 = jnp.float32
    ndiag, n = bands.shape
    m = 2 * s + 1
    bmat = jnp.asarray(
        _basis_matrix(s, theta, delta, np.float64, shifts), f32
    )

    bdt = None if bands_dtype is None else jnp.dtype(bands_dtype)
    if bdt is not None and bdt != dtype:
        # round ONCE so the r0 mat-vec below and the streamed planes
        # use the same (possibly rounded) operator — cf. cg_stream's
        # bands_dtype; bitwise no-op when every band value is
        # bdt-exact, which is what bands_dtype='auto' guarantees
        bands = bands.astype(bdt).astype(dtype)
    else:
        bdt = None
    align = bdt if (bdt is not None and bdt.itemsize < dtype.itemsize) \
        else dtype
    n_p, _, _, _, pm, _ = _powers_geometry(
        offsets, s, rows, cols, align, n
    )
    bands_pl = sstep_powers_band_planes(
        bands, offsets=offsets, s=s, rows=rows, cols=cols,
        align_dtype=align,
    )
    if bdt is not None:
        bands_pl = bands_pl.astype(bdt)

    def halo_plane(v):
        return jnp.pad(
            v, (pm * cols, pm * cols + (n_p - n))
        ).reshape(-1, cols)

    r0 = b - banded_matvec(bands, offsets, x0)
    rs0 = jnp.sum(r0.astype(f32) * r0.astype(f32))
    pre_conv = jnp.logical_or(jnp.sqrt(rs0) < tol, rs0 == 0)

    x_pl0 = jnp.pad(x0, (0, n_p - n)).reshape(-1, cols)
    r_pl0 = halo_plane(r0)
    p_pl0 = r_pl0

    def cond(state):
        k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = state
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_and(jnp.logical_not(conv), jnp.logical_not(brk)),
        )

    def body(state):
        k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = state
        g2 = _sstep_gram(
            bands_pl, p_pl, r_pl, offsets=offsets, s=s, theta=theta,
            delta=delta, shifts=shifts, rows=rows, cols=cols,
            interpret=interpret,
        )
        g = g2[0] + g2[1]
        xc, d, c, k, rs, rsnew, conv, brk = replay_block(
            g, bmat, s, k, rsnew, conv, brk,
            tol=tol, nearzero=nearzero, maxiter=maxiter,
        )
        coef = jnp.stack([xc, d, c]).astype(dtype)
        x_pl, r_pl, p_pl = _sstep_recover(
            bands_pl, p_pl, r_pl, x_pl, coef, offsets=offsets, s=s,
            theta=theta, delta=delta, shifts=shifts, rows=rows,
            cols=cols, interpret=interpret,
        )
        return (k, x_pl, p_pl, r_pl, rs, rsnew, conv, brk)

    state0 = (
        jnp.asarray(0, jnp.int32), x_pl0, p_pl0, r_pl0,
        rs0, rs0, pre_conv, jnp.asarray(False),
    )
    k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = jax.lax.while_loop(
        cond, body, state0
    )
    return CGResult(
        x=x_pl.reshape(-1)[:n],
        iterations=k,
        residual_norm=jnp.sqrt(rsnew).astype(dtype),
        converged=conv,
        rsold=rsold.astype(dtype),
        history=jnp.zeros((0,), dtype),
        breakdown=brk,
    )
