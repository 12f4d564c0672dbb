"""HBM-streaming fused-iteration CG kernel for banded operators.

The regime above the VMEM cliff (state > ~32 MB, N >~ 2e6 fp32): the
XLA-fused while_loop — round 2's champion — achieves 62-67% of HBM
peak at N=1e6 and drops to ~30% at N=1e7 (BENCHMARKS.md), because XLA
schedules the iteration as several imperfectly-overlapped fusions.
This kernel performs ONE whole Chronopoulos-Gear CG iteration per
``pallas_call``: a single double-buffered streaming pass over the
bands and all five state vectors, with both scalar reductions
accumulated in SMEM across the (sequential) TPU grid. Per-iteration
HBM traffic is the speed-of-light 15N words:

    read  bands (ndiag*N) + p + x + halo'd r, w, s      ~ (ndiag+5) N
    write p, x, r, w, s                                 ~ 5 N

The Chronopoulos-Gear reordering (cgx.solver.pipelined docstring) is
what makes a single fused pass possible at all: every vector update of
iteration k uses only scalars derived from iteration k-1's reductions,
so alpha/beta enter the kernel as SMEM constants and the two new dots
(<r,r>, <w,r>) leave it as SMEM accumulators — no mid-pass global
synchronization, which classic CG's recurrence (cg.cc:96-137) would
force twice per iteration.

Blocks are row-major (rows, cols) vreg planes (cf. dia_matvec_stream2d)
with an M = p_rows row halo: r/w/s windows of height rows + 2M are
DMA'd, the elementwise updates run on the full window, and the fused
mat-vec w_new = A r_new is exact on the central ``rows`` — the same
read-margin argument as the matrix-powers kernel (cgx.ops.dia_powers)
with a single application.

Measured efficiency, CURRENT (TPU v5e, round 3-4): with
``input_output_aliases`` + the in-place DMA-ordering fix below, the
kernel reaches **90.4% of the 819 GB/s nominal peak at N=4e6** (324.3
us/iter, modeled 15N words) and ~79.6% at N=1.024e7 on the (512,512)
slab. The round-2 era 49-53% plateau was never the kernel: the round-3
device profile attributed it to XLA while-carry COPIES of the five
state buffers (57.2 us/iter of copies vs 59.5 of kernel at N=1e6,
results/hw_queue_r3/profile_attempt.json), eliminated by aliasing.
History of the (then-misread) black-box controls and the acquitted
in-kernel suspects: BENCHMARKS.md round-2 sessions 8-10 and round-3
session 3.

What bounds the kernel NOW (round-4 session 2 controls):
- at 1e7 the deficit is IN-KERNEL (trace: 978 of 1002.8 us/iter is
  kernel self-time, copies ~4 us) and partly SHAPE — bigger slabs
  amortize per-block DMA bubbles past ~400 MB state, hence the
  size-adaptive ``rows`` default ((512,512) 79.6% trusted vs (256,512)
  76.6%, results/stream_kernel_sweep.txt);
- the trivial-compute manual-DMA control at the same 10R+5W mix
  sustains a FLAT ~659 GB/s (80% nominal) at both 4e6 and 1e7
  (bw_control6_footprint), so the tuned kernel sits at the machinery
  bound at 1e7. (The 4e6 figure exceeding the control reflects the
  known 15N-model overcount of the in-place x update — cross-size
  %-of-peak comparisons are approximate.)
- bf16 band planes (``bands_dtype='auto'``) are the best absolute
  rate everywhere: 271-283 us/iter at 4e6, 780-802 at 1e7.

Still true from rounds 2-3: lane rolls largely acquitted (shared-roll
plane_matvec; pad_stride never pays on v5e), the while_loop boundary
costs nothing, stacking the state arrays changes nothing post-alias.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops._util import (
    LANES, no_x64_trace, plane_matvec, round_up, sublanes,
)
from cgx.solver.cg import CGResult


# --- grid-stride padding --------------------------------------------------
#
# A flat shift by off = q*cols + s costs a lane roll whenever s != 0.
# For grid operators the large offsets are multiples of the grid's
# fastest-dim length L (±L, ±L² in 3-D): padding each grid row from L
# to L2 = round_up(L, cols) makes every such offset a multiple of cols
# — a FREE row shift — leaving only the ±1 lane rolls. Exact whenever
# the small-|c| bands are zero at grid-row boundaries (true for the
# Dirichlet stencils lap2d_fd/lap3d_fd; false for the quasi-stencil
# lap2d_reference, whose ±1 band crosses rows — checked on device at
# setup). Padded entries: identity rows (diag 1, off-diag 0, b 0), so
# their residual stays exactly zero and every reduction is unchanged.


def _stride_remap(offsets, stride: int, stride2: int):
    """Balanced decomposition o = a*stride + c, |c| <= stride//2 ->
    (new offsets a*stride2 + c, the c values)."""
    new, cs = [], []
    for o in offsets:
        a, c = divmod(o, stride)
        if c > stride // 2:
            a, c = a + 1, c - stride
        new.append(a * stride2 + c)
        cs.append(c)
    return tuple(new), tuple(cs)


@functools.partial(jax.jit, static_argnames=("offsets", "stride"))
def _stride_crossing_sum(bands, *, offsets, stride: int):
    _, cs = _stride_remap(offsets, stride, stride)
    i = jnp.arange(bands.shape[1], dtype=jnp.int32) % stride
    # count nonzero entries rather than summing |values|: subnormal
    # band entries flush to zero in an f32 sum on TPU, which would
    # falsely certify padding as exact for a coupling operator
    bad = jnp.zeros((), jnp.int32)
    for d, c in enumerate(cs):
        if c == 0:
            continue
        m = (i >= stride - c) if c > 0 else (i < -c)
        bad += jnp.sum(((bands[d] != 0) & m).astype(jnp.int32))
    return bad


def _stride_crossing_nonzero(bands, offsets, stride: int) -> bool:
    """True if any band entry couples across a grid-row boundary for
    an offset with a nonzero lane component — grid-stride padding
    would then change the operator. One jitted reduce + fetch."""
    return bool(
        _stride_crossing_sum(bands, offsets=tuple(offsets), stride=stride)
        > 0
    )


def _stride_pack_vec(v, stride: int, stride2: int):
    """Pack a flat length-n vector into the padded-stride layout
    (zeros in the padding), length ceil(n/stride)*stride2."""
    n = v.shape[0]
    nr = -(-n // stride)
    v2 = jnp.pad(v, (0, nr * stride - n)).reshape(nr, stride)
    v2 = jnp.pad(v2, ((0, 0), (0, stride2 - stride)))
    return v2.reshape(-1)


def _stride_pack_bands(bands, stride: int, stride2: int, d0: int):
    """Pack each band row; padded positions become identity rows
    (diag 1 via the packed all-ones mask, off-diagonals stay 0)."""
    packed = jax.vmap(
        lambda row: _stride_pack_vec(row, stride, stride2)
    )(bands)
    if d0 is None:
        return packed
    mask = _stride_pack_vec(
        jnp.ones(bands.shape[1], bands.dtype), stride, stride2
    )
    return packed.at[d0].set(jnp.where(mask == 0, 1.0, packed[d0]))


def _stride_unpack_vec(v2, stride: int, stride2: int, n: int):
    nr = -(-n // stride)
    return v2[: nr * stride2].reshape(nr, stride2)[:, :stride].reshape(
        -1
    )[:n]


def _auto_pad_stride(offsets, cols: int, bands, pad_stride,
                     max_overhead: float = 0.06):
    """Resolve the pad_stride policy -> (stride, stride2) or None.

    Candidate strides are the distinct |off| > 1 (for a 3-D 7-point
    stencil both g and g² — stride=g² frees only ±g², stride=g would
    free all four but its padding quantum round_up(g, cols)/g is
    usually ruinous at 3-D grid sizes). Each candidate is scored by
    (lane rolls eliminated, -overhead); 'auto' additionally requires
    overhead <= max_overhead and the device-side boundary check. True
    bypasses the overhead cap and raises if the only blocker is a
    nonzero boundary coupling.
    """
    if not pad_stride:
        return None
    cands = []  # (saved, -overhead, stride, stride2), best first
    for stride in sorted({abs(o) for o in offsets if abs(o) > 1}):
        stride2 = round_up(stride, cols)
        if stride2 == stride:
            continue
        _, cs = _stride_remap(offsets, stride, stride2)
        if any(abs(c) >= cols for c in cs):
            continue
        saved = sum(
            1 for o, c in zip(offsets, cs) if o % cols and not c % cols
        )
        overhead = stride2 / stride - 1.0
        if not saved:
            continue
        if pad_stride == "auto" and overhead > max_overhead:
            continue
        cands.append((saved, -overhead, stride, stride2))
    # try candidates best-scored first; a wrong-stride winner (e.g. a
    # 9-point stencil where ±(g±1) tie the score) must fall back to
    # the next one instead of giving up
    for _, _, stride, stride2 in sorted(cands, reverse=True):
        if not _stride_crossing_nonzero(bands, offsets, stride):
            return stride, stride2
    if cands and pad_stride != "auto":
        raise ValueError(
            "pad_stride=True but the operator couples across grid-row "
            "boundaries on a lane-component offset — padding would "
            "change the matrix (use pad_stride='auto' or False)"
        )
    return None


def _halo_margin(offsets, cols: int, dtype, chain: int = 1) -> int:
    """Slab halo margin in rows: ``chain`` chained band applications
    need chain * p_rows valid rows, rounded up to the dtype's sublane
    tile so every DMA slice offset/height stays Mosaic-aligned."""
    p_rows = max(abs(o) // cols + 1 for o in offsets)
    return round_up(chain * p_rows, sublanes(dtype))


def _iter_kernel(
    offsets: Tuple[int, ...],
    m_rows: int,
    rows: int,
    cols: int,
    # inputs
    r_hbm, w_hbm, s_hbm,  # halo'd planes, ANY (manual DMA)
    bands_ref, p_ref, x_ref,  # auto VMEM blocks
    scal_ref,  # SMEM (1, 2): [alpha, beta]
    # outputs
    r_out, w_out, s_out,  # halo'd planes, ANY (manual DMA)
    p_out, x_out,  # auto VMEM blocks
    dots_ref,  # SMEM (1, 2): [gamma_new, delta_new] accumulators
    # scratch
    rslab, wslab, sslab, stage, zrow, sems, out_sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = rows + 2 * m_rows

    def in_copies(jj, slot):
        return (
            pltpu.make_async_copy(
                r_hbm.at[pl.ds(jj * rows, height), :],
                rslab.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(jj * rows, height), :],
                wslab.at[slot], sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(jj * rows, height), :],
                sslab.at[slot], sems.at[slot, 2],
            ),
        )

    @pl.when(j == 0)
    def _():
        for c in in_copies(0, 0):
            c.start()
        # zero the halo rows of the fresh output planes (top + bottom)
        # so next iteration's edge windows read correct padding; waited
        # here, before the staged interior copies reuse out_sems
        zrow[:, :] = jnp.zeros_like(zrow)
        zcopies = []
        for t, out in enumerate((r_out, w_out, s_out)):
            zcopies.append(pltpu.make_async_copy(
                zrow, out.at[pl.ds(0, m_rows), :], out_sems.at[0, t]
            ))
            zcopies.append(pltpu.make_async_copy(
                zrow,
                out.at[pl.ds(m_rows + nb * rows, m_rows), :],
                out_sems.at[1, t],
            ))
        for c in zcopies:
            c.start()
        for c in zcopies:
            c.wait()

    @pl.when(j + 1 < nb)
    def _():
        for c in in_copies(j + 1, (j + 1) % 2):
            c.start()

    @pl.when(j == 0)
    def _():
        # only step 0 waits its own input here; every other step's
        # input was waited at the END of the previous step (in-place
        # aliasing: block j's output region overlaps block j+1's input
        # halo by m_rows, so the j+1 prefetch READ must complete before
        # block j's output DMA may start — measured corruption at
        # g=2000 without this ordering, results/hw_queue_r3/
        # stream_alias_race.log)
        for c in in_copies(0, 0):
            c.wait()
    slot = j % 2

    dt = x_ref.dtype
    alpha = scal_ref[0, 0].astype(dt)
    beta = scal_ref[0, 1].astype(dt)

    # elementwise updates on the full halo'd window (the halo rows hold
    # the true values of the padded planes, so every row is exact)
    s_new = wslab[slot] + beta * sslab[slot]
    r_new = rslab[slot] - alpha * s_new

    def band(d):
        return bands_ref[d].astype(dt)

    # central rows only; shared-roll shifts (plane_matvec: one roll
    # per distinct off % cols instead of flat_shift's two per offset)
    w_new = plane_matvec(band, r_new, offsets, m_rows, rows, cols)

    r_int = r_new[m_rows : m_rows + rows, :]
    s_int = s_new[m_rows : m_rows + rows, :]
    # p_k = r_k + beta p_{k-1} uses the CURRENT residual (the slab),
    # not r_{k+1} — Chronopoulos-Gear update order, pipelined.py:128
    p_new = rslab[slot, m_rows : m_rows + rows, :] + beta * p_ref[:, :]
    x_out[:, :] = x_ref[:, :] + alpha * p_new
    p_out[:, :] = p_new

    f32 = jnp.float32
    gamma_part = jnp.sum((r_int * r_int).astype(f32))
    delta_part = jnp.sum((w_new * r_int).astype(f32))

    @pl.when(j == 0)
    def _():
        dots_ref[0, 0] = jnp.zeros_like(dots_ref[0, 0])
        dots_ref[0, 1] = jnp.zeros_like(dots_ref[0, 1])

    dots_ref[0, 0] += gamma_part
    dots_ref[0, 1] += delta_part

    # stage the three halo'd outputs and DMA them out, double-buffered:
    # wait the copy issued two steps ago before overwriting its stage
    def out_copies(jj, oslot):
        return (
            pltpu.make_async_copy(
                stage.at[oslot, 0],
                r_out.at[pl.ds(m_rows + jj * rows, rows), :],
                out_sems.at[oslot, 0],
            ),
            pltpu.make_async_copy(
                stage.at[oslot, 1],
                w_out.at[pl.ds(m_rows + jj * rows, rows), :],
                out_sems.at[oslot, 1],
            ),
            pltpu.make_async_copy(
                stage.at[oslot, 2],
                s_out.at[pl.ds(m_rows + jj * rows, rows), :],
                out_sems.at[oslot, 2],
            ),
        )

    # in-place safety: the j+1 input prefetch reads m_rows rows that
    # block j's output is about to overwrite — it must COMPLETE before
    # the output DMA starts (it had all of this step's compute to run)
    @pl.when(j + 1 < nb)
    def _():
        for c in in_copies(j + 1, (j + 1) % 2):
            c.wait()

    @pl.when(j >= 2)
    def _():
        for c in out_copies(j - 2, j % 2):
            c.wait()

    stage[j % 2, 0] = r_int
    stage[j % 2, 1] = w_new
    stage[j % 2, 2] = s_int
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
    static_argnames=("offsets", "rows", "cols", "interpret"),
)
def _stream_iteration(
    bands_pl, p, x, r_h, w_h, s_h, scal,
    *, offsets, rows, cols, interpret,
):
    ndiag, rows_p, _ = bands_pl.shape
    dtype = p.dtype
    # read margin: shifts reach p_rows rows past the region; rounded up
    # to the sublane tile so halo'd DMA slices stay Mosaic-aligned
    m_rows = _halo_margin(offsets, cols, dtype)
    if m_rows > rows:
        raise ValueError(
            f"aliased stream kernel in-place hazard: halo m_rows="
            f"{m_rows} > rows={rows}; block j's output would overwrite "
            "rows block j+2 still reads. _dia_cg_stream grows rows "
            "automatically."
        )
    nb = rows_p // rows
    grid = (nb,)
    height = rows + 2 * m_rows
    return pl.pallas_call(
        functools.partial(_iter_kernel, offsets, m_rows, rows, cols),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # r halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # w halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # s halo'd
            pl.BlockSpec(
                (ndiag, rows, cols), lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # r_out halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # w_out halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # s_out halo'd
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(r_h.shape, dtype),
            jax.ShapeDtypeStruct(w_h.shape, dtype),
            jax.ShapeDtypeStruct(s_h.shape, dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, height, cols), dtype),  # rslab
            pltpu.VMEM((2, height, cols), dtype),  # wslab
            pltpu.VMEM((2, height, cols), dtype),  # sslab
            pltpu.VMEM((2, 3, rows, cols), dtype),  # out stage
            pltpu.VMEM((m_rows, cols), dtype),  # zero halo rows
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        # alias every state input onto its output: without this, XLA
        # copies all five state buffers back into the while-loop carry
        # EVERY iteration — profiled at 57.2 us/iter of copies next to
        # the kernel's own 59.5 us/iter at N=1e6 (the round-2
        # sessions-9/10 "missing bandwidth", finally attributed:
        # results/hw_queue_r3/profile_attempt.json). In-place is safe:
        # the staged output DMA trails the input reads by >= 2 blocks
        # (rows - m_rows rows), and the j==0 halo zeroing rewrites
        # rows that are already zero.
        input_output_aliases={0: 0, 1: 1, 2: 2, 4: 3, 5: 4},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * ndiag + 8) * rows_p * cols,
            bytes_accessed=(ndiag + 10) * rows_p * cols * dtype.itemsize,
            transcendentals=0,
        ),
    )(r_h, w_h, s_h, bands_pl, p, x, scal)


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "maxiter", "rows", "cols", "interpret", "layout",
        "bands_dtype",
    ),
)
@no_x64_trace
def _dia_cg_stream(
    bands, b, tol, nearzero,
    *, offsets, maxiter, rows, cols, interpret, layout="split",
    bands_dtype=None,
):
    dtype = b.dtype
    ndiag, n = bands.shape
    m_rows = _halo_margin(offsets, cols, dtype)  # matches _stream_iteration
    # in-place aliasing safety (advisor r3): the aliased kernels order
    # block j's output DMA only against block j+1's prefetch, so block
    # j+2's read window must not overlap j's write — requires
    # rows >= m_rows (same hazard as sstep_stream's recover kernel;
    # reachable for offsets > rows*cols, e.g. lap3d at large grids).
    # m_rows is sublane-aligned, so growing rows keeps DMA alignment.
    if m_rows > rows:
        rows = m_rows
    block = rows * cols
    n_p = round_up(n, block)
    rows_p = n_p // cols
    if bands_dtype is not None and jnp.dtype(bands_dtype) != dtype:
        # low-precision band planes (round-3 VERDICT item 2): the bands
        # are loop-invariant and account for ndiag*N of the (ndiag+10)*N
        # streamed words per iteration — storing them bf16 cuts analytic
        # traffic by ndiag/2 words/row (~17% for a 5-point stencil) and
        # the kernel's existing per-band .astype(dt) widens them on the
        # VPU, off the DMA critical path. The solve then runs on the
        # ROUNDED operator A' = cast(A): exact for integer stencil
        # constants (lap2d/lap3d: 4, 6, -1 are bf16-exact), a
        # preconditioner-grade approximation otherwise — the setup
        # mat-vec below uses the same rounded bands so the recurrence
        # stays consistent with the kernel's operator.
        bands = bands.astype(jnp.dtype(bands_dtype)).astype(dtype)
        bands_lo = True
    else:
        bands_lo = False
    bands_pl = jnp.pad(bands, ((0, 0), (0, n_p - n))).reshape(
        ndiag, rows_p, cols
    )
    if bands_lo:
        bands_pl = bands_pl.astype(jnp.dtype(bands_dtype))

    def halo_plane(v_flat):
        # v_flat already padded to n_p; add the M halo rows either side
        return jnp.pad(
            v_flat, (m_rows * cols, m_rows * cols)
        ).reshape(-1, cols)

    f32 = jnp.float32
    b_p = jnp.pad(b, (0, n_p - n))
    # x0 = 0: r0 = b; w0 = A r0 (one XLA banded mat-vec at setup)
    from cgx.solver.operators import banded_matvec

    w0_flat = banded_matvec(
        jnp.pad(bands, ((0, 0), (0, n_p - n))), offsets, b_p
    )
    r_h0 = halo_plane(b_p)
    w_h0 = halo_plane(w0_flat)
    s_h0 = jnp.zeros_like(r_h0)
    p0 = jnp.zeros((rows_p, cols), dtype)
    x0 = jnp.zeros((rows_p, cols), dtype)
    gamma0 = jnp.sum(b_p.astype(f32) * b_p.astype(f32))
    delta0 = jnp.sum(w0_flat.astype(f32) * b_p.astype(f32))
    tol32 = tol.astype(f32)
    nz32 = nearzero.astype(f32)

    stacked = layout == "stacked"
    state0 = (
        (jnp.stack([r_h0, w_h0, s_h0]),) if stacked
        else (r_h0, w_h0, s_h0)
    )

    def cond(carry):
        k, gamma = carry[0], carry[-5]
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_and(jnp.sqrt(gamma) >= tol32, gamma > 0),
        )

    def body(carry):
        (k, x, p, *state), gamma, delta, g_old, a_old, brk = (
            carry[:-5], *carry[-5:]
        )
        first = k == 0
        zero = jnp.zeros((), f32)
        beta = jnp.where(first, zero, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        brk = jnp.logical_or(brk, denom <= 0)
        alpha = gamma / jnp.maximum(denom, gamma * nz32)
        scal = jnp.stack([alpha, beta]).reshape(1, 2)
        if stacked:
            rws2, p2, x2, dots = _stream_iteration_stacked(
                bands_pl, p, x, state[0], scal,
                offsets=offsets, rows=rows, cols=cols,
                interpret=interpret,
            )
            state2 = (rws2,)
        else:
            r_h2, w_h2, s_h2, p2, x2, dots = _stream_iteration(
                bands_pl, p, x, *state, scal,
                offsets=offsets, rows=rows, cols=cols,
                interpret=interpret,
            )
            state2 = (r_h2, w_h2, s_h2)
        return (
            k + 1, x2, p2, *state2,
            dots[0, 0], dots[0, 1], gamma, alpha, brk,
        )

    carry0 = (
        jnp.asarray(0, jnp.int32), x0, p0, *state0,
        gamma0, delta0,
        gamma0,  # g_old: meaningful rsold on pre-converged exit
        jnp.ones((), f32), jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, carry0)
    k, x = out[0], out[1]
    gamma, g_old, brk = out[-5], out[-3], out[-1]
    return CGResult(
        x=x.reshape(-1)[:n],
        iterations=k,
        residual_norm=jnp.sqrt(gamma),
        converged=jnp.sqrt(gamma) < tol32,
        rsold=g_old,
        history=jnp.zeros((0,), dtype),
        breakdown=brk,
    )


@functools.partial(
    jax.jit, static_argnames=("stride", "stride2", "d0")
)
@no_x64_trace
def _stride_pack_bands_jit(bands, *, stride, stride2, d0):
    return _stride_pack_bands(bands, stride, stride2, d0)


@functools.partial(jax.jit, static_argnames=("stride", "stride2", "n"))
@no_x64_trace
def _stride_unpack_jit(x2, *, stride, stride2, n):
    return _stride_unpack_vec(x2, stride, stride2, n)


@functools.partial(jax.jit, static_argnames=("stride", "stride2"))
@no_x64_trace
def _stride_pack_vec_jit(v, *, stride, stride2):
    return _stride_pack_vec(v, stride, stride2)


def _pad_stride_setup(op, b, cols: int, pad_stride):
    """Resolve + apply grid-stride padding for a streaming solve.

    Returns (bands, b, offsets, unpack) where unpack maps the padded
    solution back (identity when padding is off). The exactness
    verdict is cached on the operator object (one device reduce +
    fetch on first use)."""
    offsets = tuple(op.offsets)
    # the cache is keyed on the band array's IDENTITY (a rebound
    # op.bands on the mutable dataclass must invalidate both the packed
    # copy and the exactness verdict) — the bands object itself is held
    # in the entry and compared with `is`, never via id() integers,
    # which CPython reuses after garbage collection (advisor r3)
    cache_key = (offsets, int(cols), str(pad_stride))
    cached = getattr(op, "_pad_stride_cache", None)
    if (
        cached is not None
        and cached[0] == cache_key
        and cached[3] is op.bands
    ):
        ps, bands2 = cached[1], cached[2]
    else:
        ps = _auto_pad_stride(offsets, int(cols), op.bands, pad_stride)
        bands2 = None
        if ps is not None:
            stride, stride2 = ps
            d0 = offsets.index(0) if 0 in offsets else None
            bands2 = _stride_pack_bands_jit(
                op.bands, stride=stride, stride2=stride2, d0=d0
            )
        try:
            # bands never change between solves with the same op, so
            # the packed copy rides the verdict cache
            op._pad_stride_cache = (cache_key, ps, bands2, op.bands)
        except Exception:
            pass
    if ps is None:
        return op.bands, b, offsets, (lambda x: x)
    stride, stride2 = ps
    n = b.shape[0]
    offsets2, _ = _stride_remap(offsets, stride, stride2)
    b2 = _stride_pack_vec_jit(b, stride=stride, stride2=stride2)

    def unpack(x):
        return _stride_unpack_jit(x, stride=stride, stride2=stride2, n=n)

    return bands2, b2, offsets2, unpack


def dia_cg_solve_stream(
    op,
    b: jnp.ndarray,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    rows: Optional[int] = None,
    cols: int = 512,
    interpret: bool = False,
    layout: str = "split",
    pad_stride=False,
    bands_dtype=None,
) -> CGResult:
    """Chronopoulos-Gear CG with one fused streaming kernel launch per
    iteration — the banded large-N path (state above the VMEM budget).

    ``rows=None`` resolves by size: 512 at N >= 8e6, else 256. The
    post-alias block sweep (results/hw_queue_r4/stream_tune_aliased,
    trusted spreads) is flat at N=4e6 but NOT at 1e7: (512,512) runs
    919.6 us/iter (79.6%) vs (256,512)'s 955.8 (76.6%) and (128,512)'s
    1031.7 (71.0%) — bigger slabs amortize per-block DMA bubbles once
    the working set passes ~400 MB.

    ``op`` is a :class:`cgx.solver.operators.DiaOperator` (fp32/bf16;
    fp64 has no Pallas TPU lowering — use the XLA path for parity).
    Math and stopping semantics mirror
    :func:`cgx.solver.pipelined.pipelined_cg_solve` (same scalar
    recurrence, reference-spirit alpha clamp and breakdown flag);
    trajectories agree with it to rounding.

    ``layout``: 'split' (r/w/s in three HBM arrays; 3 slab DMAs in +
    3 staged DMAs out per block) or 'stacked' (ONE (3, rows_h, cols)
    array; 1 DMA each way — the bw_control4 follow-up).

    ``pad_stride``: False (default) / 'auto' / True. 'auto' pads the
    grid's fastest dimension to a multiple of ``cols`` when that is
    exact and costs <= 6% extra traffic, turning the ±grid-stride
    band offsets into free row shifts (only the ±1 lane rolls remain
    — see the module-top grid-stride padding note); True forces it
    (raises if the operator couples across grid-row boundaries).
    Default False: the v5e race (results/hw_queue_r2s10_pad_race.json)
    showed the freed rolls are not on the critical path, so the
    padding traffic never pays for itself on that chip — the option
    remains for architectures where lane rolls are costlier.

    ``bands_dtype``: optional narrower storage dtype for the streamed
    band planes (e.g. ``jnp.bfloat16`` with fp32 state): ~17% less
    HBM traffic per iteration for a 5-point stencil, in-kernel VPU
    widening. The solve targets the ROUNDED operator — exact for
    bf16-representable stencils like lap2d/lap3d, otherwise use only
    where a perturbed A is acceptable (e.g. as a refinement inner).
    ``'auto'`` takes bf16 ONLY when the cast roundtrip reproduces the
    bands bit-exactly (one scalar device check at setup), i.e. the
    solved operator is untouched — measured on the aliased kernel at
    N=4e6: 282.8 vs 333-349 us/iter, the full 15/12.5 analytic win,
    iteration-neutral (results/hw_queue_r3/bf16_bands_race2.json).
    """
    if cols % LANES != 0:
        raise ValueError(f"cols must be a multiple of {LANES}, got {cols}")
    if layout not in ("split", "stacked"):
        raise ValueError(f"unknown layout {layout!r}")
    if op.dtype == jnp.float64:
        raise TypeError(
            "the streaming CG kernel has no fp64 TPU lowering; use the "
            "XLA path (cg_solve / pipelined_cg_solve) for fp64 parity"
        )
    n = b.shape[0]
    if rows is None:
        rows = 512 if n >= 8_000_000 else 256
    if maxiter is None:
        maxiter = n
    if isinstance(bands_dtype, str) and bands_dtype == "auto":
        exact = bool(jnp.all(
            op.bands.astype(jnp.bfloat16).astype(op.bands.dtype)
            == op.bands
        ))
        bands_dtype = jnp.bfloat16 if exact else None
    bands, b2, offsets, unpack = _pad_stride_setup(op, b, cols, pad_stride)
    # Exact power-of-2 RHS prescale (cgx.ops._util.pow2_rhs_scale):
    # ||r||^2 overflows f32 once max|b| exceeds ~1e17 (and underflows
    # for tiny b); bitwise no-op for well-scaled inputs.
    from cgx.ops._util import pow2_rhs_scale

    down, up = pow2_rhs_scale(b2)
    res = _dia_cg_stream(
        bands,
        b2 * down,
        jnp.asarray(tol, jnp.float32) * down.astype(jnp.float32),
        jnp.asarray(nearzero, jnp.float32),
        offsets=offsets,
        maxiter=int(maxiter),
        rows=int(rows),
        cols=int(cols),
        interpret=bool(interpret),
        layout=layout,
        bands_dtype=(
            None if bands_dtype is None else jnp.dtype(bands_dtype).name
        ),
    )
    return res._replace(
        x=unpack(res.x) * up,
        residual_norm=res.residual_norm * up.astype(res.residual_norm.dtype),
        rsold=res.rsold * (up * up).astype(res.rsold.dtype),
    )


# --- stacked-state variant ------------------------------------------------
#
# Same math as _iter_kernel, but r/w/s live in ONE (3, rows_h, cols)
# HBM array: each grid step issues ONE slab DMA in and ONE staged DMA
# out instead of 3+3. Motivation (scripts/bw_control4.py): the plain
# planes mat-vec kernel (1 slab in, BlockSpec out) sustains the chip's
# achievable streaming bandwidth (~880 GB/s apparent), while the
# split-buffer fused iteration sits at ~420-430 GB/s — the DMA
# machinery is not the cap, the 6-stream structure is.


def _iter_kernel_stacked(
    offsets: Tuple[int, ...],
    m_rows: int,
    rows: int,
    cols: int,
    # inputs
    rws_hbm,                  # (3, rows_h, cols) halo'd, ANY (manual DMA)
    bands_ref, p_ref, x_ref,  # auto VMEM blocks
    scal_ref,                 # SMEM (1, 2): [alpha, beta]
    # outputs
    rws_out,                  # (3, rows_h, cols) halo'd, ANY (manual DMA)
    p_out, x_out,             # auto VMEM blocks
    dots_ref,                 # SMEM (1, 2): [gamma_new, delta_new]
    # scratch
    slab, stage, zslab, sems, out_sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = rows + 2 * m_rows

    def in_copy(jj, slot):
        return pltpu.make_async_copy(
            rws_hbm.at[:, pl.ds(jj * rows, height), :],
            slab.at[slot], sems.at[slot],
        )

    @pl.when(j == 0)
    def _():
        in_copy(0, 0).start()
        # zero the halo rows of the fresh output planes (top + bottom)
        zslab[:, :, :] = jnp.zeros_like(zslab)
        ztop = pltpu.make_async_copy(
            zslab, rws_out.at[:, pl.ds(0, m_rows), :], out_sems.at[0]
        )
        zbot = pltpu.make_async_copy(
            zslab,
            rws_out.at[:, pl.ds(m_rows + nb * rows, m_rows), :],
            out_sems.at[1],
        )
        ztop.start()
        zbot.start()
        ztop.wait()
        zbot.wait()

    @pl.when(j + 1 < nb)
    def _():
        in_copy(j + 1, (j + 1) % 2).start()

    @pl.when(j == 0)
    def _():
        # only step 0 waits its own input here; every other step's
        # input was waited at the END of the previous step (in-place
        # aliasing: block j's output region overlaps block j+1's input
        # halo by m_rows — same ordering as _iter_kernel, measured
        # corruption without it: results/hw_queue_r3/stream_alias_race.log)
        in_copy(0, 0).wait()
    slot = j % 2

    dt = x_ref.dtype
    alpha = scal_ref[0, 0].astype(dt)
    beta = scal_ref[0, 1].astype(dt)

    s_new = slab[slot, 1] + beta * slab[slot, 2]
    r_new = slab[slot, 0] - alpha * s_new

    def band(d):
        return bands_ref[d].astype(dt)

    # central rows only; shared-roll shifts (see _iter_kernel)
    w_new = plane_matvec(band, r_new, offsets, m_rows, rows, cols)

    r_int = r_new[m_rows : m_rows + rows, :]
    s_int = s_new[m_rows : m_rows + rows, :]
    p_new = slab[slot, 0, m_rows : m_rows + rows, :] + beta * p_ref[:, :]
    x_out[:, :] = x_ref[:, :] + alpha * p_new
    p_out[:, :] = p_new

    f32 = jnp.float32
    gamma_part = jnp.sum((r_int * r_int).astype(f32))
    delta_part = jnp.sum((w_new * r_int).astype(f32))

    @pl.when(j == 0)
    def _():
        dots_ref[0, 0] = jnp.zeros_like(dots_ref[0, 0])
        dots_ref[0, 1] = jnp.zeros_like(dots_ref[0, 1])

    dots_ref[0, 0] += gamma_part
    dots_ref[0, 1] += delta_part

    def out_copy(jj, oslot):
        return pltpu.make_async_copy(
            stage.at[oslot],
            rws_out.at[:, pl.ds(m_rows + jj * rows, rows), :],
            out_sems.at[oslot],
        )

    # in-place safety: the j+1 input prefetch reads m_rows rows that
    # block j's output is about to overwrite — it must COMPLETE before
    # the output DMA starts (it had all of this step's compute to run)
    @pl.when(j + 1 < nb)
    def _():
        in_copy(j + 1, (j + 1) % 2).wait()

    @pl.when(j >= 2)
    def _():
        out_copy(j - 2, j % 2).wait()

    stage[j % 2, 0] = r_int
    stage[j % 2, 1] = w_new
    stage[j % 2, 2] = s_int
    out_copy(j, j % 2).start()

    @pl.when(j == nb - 1)
    def _():
        if nb >= 2:
            out_copy(j - 1, (j - 1) % 2).wait()
        out_copy(j, j % 2).wait()


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "rows", "cols", "interpret"),
)
def _stream_iteration_stacked(
    bands_pl, p, x, rws_h, scal,
    *, offsets, rows, cols, interpret,
):
    ndiag, rows_p, _ = bands_pl.shape
    dtype = p.dtype
    m_rows = _halo_margin(offsets, cols, dtype)
    if m_rows > rows:
        raise ValueError(
            f"aliased stream kernel in-place hazard: halo m_rows="
            f"{m_rows} > rows={rows} (see _stream_iteration)"
        )
    nb = rows_p // rows
    height = rows + 2 * m_rows
    return pl.pallas_call(
        functools.partial(
            _iter_kernel_stacked, offsets, m_rows, rows, cols
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # rws halo'd stack
            pl.BlockSpec(
                (ndiag, rows, cols), lambda j: (0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # rws_out
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(rws_h.shape, dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((1, 2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 3, height, cols), dtype),  # rws slab
            pltpu.VMEM((2, 3, rows, cols), dtype),    # out stage
            pltpu.VMEM((3, m_rows, cols), dtype),     # zero halo slab
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # alias the stacked state + p/x onto their outputs (same
        # while-carry-copy elimination as _stream_iteration; ROADMAP
        # "aliasing for the stacked stream layout"). Safe under the
        # m_rows <= rows guard + the j+1-prefetch-before-output wait.
        input_output_aliases={0: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(2 * ndiag + 8) * rows_p * cols,
            bytes_accessed=(ndiag + 10) * rows_p * cols * dtype.itemsize,
            transcendentals=0,
        ),
    )(rws_h, bands_pl, p, x, scal)


# --- Neumann-preconditioned variant --------------------------------------
#
# Same single-pass design, PCG recurrence (pipelined.py precond path):
#   u = M^-1 r with M^-1 = 2 D^-1 - D^-1 A D^-1   (degree-1 Neumann,
#   identical to the whole-solve kernel's in-VMEM PCG and to
#   precond.neumann_banded(sweeps=2))
# Two chained band applications per iteration (A c, then A u) mean the
# vector slabs carry an M = 2*p_rows margin and the bands are streamed
# with the same halo (diagonal band padded with ONES in halo/tail rows
# so D^-1 stays finite there; off-diagonals stay zero, making the
# padded block exactly identity — zero rows remain exactly zero).
# Traffic: (ndiag + 12) N words/iter for typically half the
# iterations of the plain kernel on diagonally dominant stencils.


def _iter_kernel_pcg(
    offsets: Tuple[int, ...],
    d0: int,        # diagonal band index
    p_rows: int,
    m: int,         # slab margin >= 2*p_rows, sublane-aligned
    rows: int,
    cols: int,
    # inputs
    r_hbm, w_hbm, s_hbm, bands_hbm,   # halo'd planes, ANY (manual DMA)
    p_ref, x_ref, u_ref,              # auto VMEM blocks
    scal_ref,                         # SMEM (1, 2): [alpha, beta]
    # outputs
    r_out, w_out, s_out,              # halo'd planes, ANY (manual DMA)
    p_out, x_out, u_out,              # auto VMEM blocks
    dots_ref,                         # SMEM (1, 3): [gamma, delta, rr]
    # scratch
    rslab, wslab, sslab, bslab, stage, zrow, sems, out_sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = rows + 2 * m

    def in_copies(jj, slot):
        return (
            pltpu.make_async_copy(
                r_hbm.at[pl.ds(jj * rows, height), :],
                rslab.at[slot], sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                w_hbm.at[pl.ds(jj * rows, height), :],
                wslab.at[slot], sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                s_hbm.at[pl.ds(jj * rows, height), :],
                sslab.at[slot], sems.at[slot, 2],
            ),
            pltpu.make_async_copy(
                bands_hbm.at[:, pl.ds(jj * rows, height), :],
                bslab.at[slot], sems.at[slot, 3],
            ),
        )

    @pl.when(j == 0)
    def _():
        for c in in_copies(0, 0):
            c.start()
        zrow[:, :] = jnp.zeros_like(zrow)
        zcopies = []
        for t, out in enumerate((r_out, w_out, s_out)):
            zcopies.append(pltpu.make_async_copy(
                zrow, out.at[pl.ds(0, m), :], out_sems.at[0, t]
            ))
            zcopies.append(pltpu.make_async_copy(
                zrow,
                out.at[pl.ds(m + nb * rows, m), :],
                out_sems.at[1, t],
            ))
        for c in zcopies:
            c.start()
        for c in zcopies:
            c.wait()

    @pl.when(j + 1 < nb)
    def _():
        for c in in_copies(j + 1, (j + 1) % 2):
            c.start()

    @pl.when(j == 0)
    def _():
        # only step 0 waits its own input here; every other step's
        # input was waited at the END of the previous step (in-place
        # aliasing: block j's output region overlaps block j+1's input
        # halo by m_rows, so the j+1 prefetch READ must complete before
        # block j's output DMA may start — measured corruption at
        # g=2000 without this ordering, results/hw_queue_r3/
        # stream_alias_race.log)
        for c in in_copies(0, 0):
            c.wait()
    slot = j % 2

    dt = x_ref.dtype
    alpha = scal_ref[0, 0].astype(dt)
    beta = scal_ref[0, 1].astype(dt)

    s_new = wslab[slot] + beta * sslab[slot]
    r_new = rslab[slot] - alpha * s_new
    invd = 1.0 / bslab[slot, d0]
    c_full = invd * r_new

    def matvec_region(src, src_base: int, b0: int, nr: int):
        """A applied to plane value ``src`` (whose row 0 sits at slab
        row ``src_base``) on output slab rows [b0, b0 + nr); bands
        read at the same slab rows. Shared-roll shifts (plane_matvec:
        one roll per distinct off % cols instead of two per offset)."""
        return plane_matvec(
            lambda di: bslab[slot, di, pl.ds(b0, nr), :],
            src, offsets, b0 - src_base, nr, cols,
        )

    # u_new on the +-p_rows extended region (slab rows
    # [m - p_rows, m + rows + p_rows)), so the second application below
    # is exact on the interior
    mid = rows + 2 * p_rows
    u_base = m - p_rows  # slab row of u_mid's first row
    ac_mid = matvec_region(c_full, 0, u_base, mid)
    c_mid = c_full[u_base : u_base + mid, :]
    invd_mid = invd[u_base : u_base + mid, :]
    u_mid = 2.0 * c_mid - invd_mid * ac_mid

    # u_mid row t corresponds to slab row u_base + t
    w_new = matvec_region(u_mid, u_base, m, rows)  # interior rows

    r_int = r_new[m : m + rows, :]
    s_int = s_new[m : m + rows, :]
    u_int = u_mid[p_rows : p_rows + rows, :]
    # p_k = u_k + beta p_{k-1} uses the STORED u (last iteration's)
    p_new = u_ref[:, :] + beta * p_ref[:, :]
    x_out[:, :] = x_ref[:, :] + alpha * p_new
    p_out[:, :] = p_new
    u_out[:, :] = u_int

    f32 = jnp.float32
    gamma_part = jnp.sum((r_int * u_int).astype(f32))
    delta_part = jnp.sum((w_new * u_int).astype(f32))
    rr_part = jnp.sum((r_int * r_int).astype(f32))

    @pl.when(j == 0)
    def _():
        for t in range(3):
            dots_ref[0, t] = jnp.zeros_like(dots_ref[0, t])

    dots_ref[0, 0] += gamma_part
    dots_ref[0, 1] += delta_part
    dots_ref[0, 2] += rr_part

    def out_copies(jj, oslot):
        return (
            pltpu.make_async_copy(
                stage.at[oslot, 0],
                r_out.at[pl.ds(m + jj * rows, rows), :],
                out_sems.at[oslot, 0],
            ),
            pltpu.make_async_copy(
                stage.at[oslot, 1],
                w_out.at[pl.ds(m + jj * rows, rows), :],
                out_sems.at[oslot, 1],
            ),
            pltpu.make_async_copy(
                stage.at[oslot, 2],
                s_out.at[pl.ds(m + jj * rows, rows), :],
                out_sems.at[oslot, 2],
            ),
        )

    # in-place safety: the j+1 input prefetch reads m_rows rows that
    # block j's output is about to overwrite — it must COMPLETE before
    # the output DMA starts (it had all of this step's compute to run)
    @pl.when(j + 1 < nb)
    def _():
        for c in in_copies(j + 1, (j + 1) % 2):
            c.wait()

    @pl.when(j >= 2)
    def _():
        for c in out_copies(j - 2, j % 2):
            c.wait()

    stage[j % 2, 0] = r_int
    stage[j % 2, 1] = w_new
    stage[j % 2, 2] = s_int
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
    static_argnames=("offsets", "rows", "cols", "interpret"),
)
def _stream_iteration_pcg(
    bands_h, p, x, u, r_h, w_h, s_h, scal,
    *, offsets, rows, cols, interpret,
):
    ndiag = bands_h.shape[0]
    p_rows = max(abs(o) // cols + 1 for o in offsets)
    dtype = p.dtype
    m = _halo_margin(offsets, cols, dtype, chain=2)
    if m > rows:
        raise ValueError(
            f"aliased stream kernel in-place hazard: halo m={m} > "
            f"rows={rows} (see _stream_iteration)"
        )
    rows_p = p.shape[0]
    nb = rows_p // rows
    height = rows + 2 * m
    d0 = tuple(offsets).index(0)
    return pl.pallas_call(
        functools.partial(
            _iter_kernel_pcg, offsets, d0, p_rows, m, rows, cols
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # r halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # w halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # s halo'd
            pl.BlockSpec(memory_space=pl.ANY),  # bands halo'd
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # p
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),  # u
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, cols), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(r_h.shape, dtype),
            jax.ShapeDtypeStruct(w_h.shape, dtype),
            jax.ShapeDtypeStruct(s_h.shape, dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((rows_p, cols), dtype),
            jax.ShapeDtypeStruct((1, 3), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, height, cols), dtype),          # rslab
            pltpu.VMEM((2, height, cols), dtype),          # wslab
            pltpu.VMEM((2, height, cols), dtype),          # sslab
            pltpu.VMEM((2, ndiag, height, cols), dtype),   # bslab
            pltpu.VMEM((2, 3, rows, cols), dtype),         # out stage
            pltpu.VMEM((m, cols), dtype),                  # zero halo
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        # state inputs aliased onto outputs — same copy-elision as
        # _stream_iteration (profiled: the un-aliased while-carry
        # copies cost as much as the kernel itself)
        input_output_aliases={0: 0, 1: 1, 2: 2, 4: 3, 5: 4, 6: 5},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(4 * ndiag + 14) * rows_p * cols,
            bytes_accessed=(ndiag + 12) * rows_p * cols * dtype.itemsize,
            transcendentals=0,
        ),
    )(r_h, w_h, s_h, bands_h, p, x, u, scal)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "maxiter", "rows", "cols", "interpret"),
)
@no_x64_trace
def _dia_cg_stream_pcg(
    bands, b, tol, nearzero,
    *, offsets, maxiter, rows, cols, interpret,
):
    dtype = b.dtype
    ndiag, n = bands.shape
    m = _halo_margin(offsets, cols, dtype, chain=2)
    # in-place aliasing safety: same j+2-read vs j-write hazard as
    # _dia_cg_stream (advisor r3), with the chain=2 margin
    if m > rows:
        rows = m
    block = rows * cols
    n_p = round_up(n, block)
    rows_p = n_p // cols
    d0 = tuple(offsets).index(0)

    from cgx.solver.operators import banded_matvec

    f32 = jnp.float32
    b_p = jnp.pad(b, (0, n_p - n))
    bands_flat = jnp.pad(bands, ((0, 0), (0, n_p - n)))
    # identity block on every padded row: diag 1, off-diags 0 — zero
    # rows stay exactly zero through M^-1 and A
    bands_flat = bands_flat.at[d0, n:].set(1.0)
    bands_h = jnp.pad(bands_flat, ((0, 0), (m * cols, m * cols)))
    bands_h = bands_h.at[d0, : m * cols].set(1.0)
    bands_h = bands_h.at[d0, bands_h.shape[1] - m * cols :].set(1.0)
    bands_h = bands_h.reshape(ndiag, -1, cols)

    def halo_plane(v_flat):
        return jnp.pad(v_flat, (m * cols, m * cols)).reshape(-1, cols)

    inv_d = 1.0 / bands_flat[d0]
    c0 = inv_d * b_p
    u0_flat = 2.0 * c0 - inv_d * banded_matvec(bands_flat, offsets, c0)
    w0_flat = banded_matvec(bands_flat, offsets, u0_flat)
    r_h0 = halo_plane(b_p)
    w_h0 = halo_plane(w0_flat)
    s_h0 = jnp.zeros_like(r_h0)
    p0 = jnp.zeros((rows_p, cols), dtype)
    x0 = jnp.zeros((rows_p, cols), dtype)
    u0 = u0_flat.reshape(rows_p, cols)
    gamma0 = jnp.sum((b_p * u0_flat).astype(f32))
    delta0 = jnp.sum((w0_flat * u0_flat).astype(f32))
    rr0 = jnp.sum((b_p * b_p).astype(f32))
    tol32 = tol.astype(f32)
    nz32 = nearzero.astype(f32)

    def cond(carry):
        k, rr = carry[0], carry[9]
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_and(jnp.sqrt(rr) >= tol32, rr > 0),
        )

    def body(carry):
        (k, x, p, u, r_h, w_h, s_h, gamma, delta, rr, g_old, a_old,
         brk) = carry
        first = k == 0
        zero = jnp.zeros((), f32)
        beta = jnp.where(first, zero, gamma / g_old)
        denom = jnp.where(first, delta, delta - beta * gamma / a_old)
        brk = jnp.logical_or(brk, denom <= 0)
        alpha = gamma / jnp.maximum(denom, gamma * nz32)
        scal = jnp.stack([alpha, beta]).reshape(1, 2)
        r_h2, w_h2, s_h2, p2, x2, u2, dots = _stream_iteration_pcg(
            bands_h, p, x, u, r_h, w_h, s_h, scal,
            offsets=offsets, rows=rows, cols=cols, interpret=interpret,
        )
        return (
            k + 1, x2, p2, u2, r_h2, w_h2, s_h2,
            dots[0, 0], dots[0, 1], dots[0, 2], gamma, alpha, brk,
        )

    carry0 = (
        jnp.asarray(0, jnp.int32), x0, p0, u0, r_h0, w_h0, s_h0,
        gamma0, delta0, rr0,
        gamma0, jnp.ones((), f32), jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, carry0)
    k, x, rr, g_old, brk = out[0], out[1], out[9], out[10], out[12]
    return CGResult(
        x=x.reshape(-1)[:n],
        iterations=k,
        residual_norm=jnp.sqrt(rr),
        converged=jnp.sqrt(rr) < tol32,
        rsold=g_old,
        history=jnp.zeros((0,), dtype),
        breakdown=brk,
    )


def dia_cg_solve_stream_pcg(
    op,
    b: jnp.ndarray,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    rows: Optional[int] = None,
    cols: int = 512,
    interpret: bool = False,
    pad_stride=False,
) -> CGResult:
    """Neumann-preconditioned streaming CG: one fused kernel launch per
    iteration, degree-1 Neumann M^-1 = 2 D^-1 - D^-1 A D^-1 applied
    in-slab (two chained band applications on a 2*p_rows read margin).

    Math and stopping semantics mirror
    :func:`cgx.solver.pipelined.pipelined_cg_solve` with
    ``precond=neumann_banded(bands, offsets, sweeps=2)``: stop on the
    UN-preconditioned residual ``sqrt(<r,r>) < tol``, reference-spirit
    alpha clamp and breakdown flag (cg.cc:107,120-121). Traffic is
    (ndiag + 12) N words/iter vs the plain kernel's (ndiag + 10) N —
    worth it whenever the preconditioner saves >~15% of iterations,
    which degree-1 Neumann on diagonally dominant stencils comfortably
    does on these grid Laplacians.
    """
    if cols % LANES != 0:
        raise ValueError(f"cols must be a multiple of {LANES}, got {cols}")
    if op.dtype == jnp.float64:
        raise TypeError(
            "the streaming CG kernel has no fp64 TPU lowering; use the "
            "XLA path (cg_solve / pipelined_cg_solve) for fp64 parity"
        )
    if 0 not in tuple(op.offsets):
        raise ValueError(
            "the Neumann-preconditioned streaming kernel needs the main "
            f"diagonal (offset 0) in the band set; got {tuple(op.offsets)}"
        )
    n = b.shape[0]
    if rows is None:
        # same size-adaptive slab as the plain kernel (see
        # dia_cg_solve_stream: bigger slabs win past ~400 MB state)
        rows = 512 if n >= 8_000_000 else 256
    if maxiter is None:
        maxiter = n
    bands, b2, offsets, unpack = _pad_stride_setup(op, b, cols, pad_stride)
    res = _dia_cg_stream_pcg(
        bands,
        b2,
        jnp.asarray(tol, jnp.float32),
        jnp.asarray(nearzero, jnp.float32),
        offsets=offsets,
        maxiter=int(maxiter),
        rows=int(rows),
        cols=int(cols),
        interpret=bool(interpret),
    )
    return res._replace(x=unpack(res.x))
