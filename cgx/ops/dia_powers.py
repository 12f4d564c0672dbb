"""Fused matrix-powers Pallas kernel for banded (DIA) operators.

s-step CG (cgx.solver.sstep) removes the reference's per-iteration
reductions (cg.cc:106,117) but, built from 2s-1 separate mat-vecs, it
still *reads the bands from HBM 2s-1 times* per outer block — an s-step
iteration is no cheaper in bandwidth than a classic one. This kernel
makes s-step CG bandwidth-avoiding too: ONE streaming pass over the
bands computes the whole Krylov basis

    V = [T_0(A)p .. T_s(A)p, T_0(A)r .. T_{s-1}(A)r]   (2s+1 rows)

for the Chebyshev three-term recurrence (or the scaled-Newton
recurrence when Leja shifts are given — cgx/solver/sstep.py docstring).

Design (the classic "matrix powers kernel", Demmel/Hoemmen 2010 §7,
recast for TPU): the flat vector is viewed as a row-major
(n/cols, cols) plane (full (8,128)-vreg occupancy — see
dia_matvec_stream2d). For each grid step, a halo'd window of p, r and
the bands is DMA'd HBM->VMEM (double-buffered); the s recurrence
applications then run entirely in VMEM, each application shrinking the
trustworthy region by ``p_rows`` rows from the slab edges; the halo
P = s*p_rows is sized so the central ``rows`` written out are exact.
Edge rows of intermediate buffers hold garbage — never read into the
central region and never written out (the standard redundant-compute
trade of matrix-powers kernels: ~2P/rows extra flops for a 2s-fold cut
in HBM traffic).

HBM traffic per outer block (s CG iterations):
  read  (ndiag + 2) * n   (bands + p + r, plus the halo surcharge)
  write (2s + 1) * n      (the basis)
vs (2s-1)(ndiag + 2) * n for 2s-1 separate streamed mat-vecs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cgx.ops._util import (
    LANES, no_x64_trace, plane_matvec, round_up, sublanes,
)


def _powers_kernel(
    offsets: Tuple[int, ...],
    wp: int,
    wr: int,
    theta: float,
    delta: float,
    shifts: Tuple[float, ...],
    m_rows: int,   # M: read margin (= p_rows)
    p_halo: int,   # P: accumulated halo (max applications * p_rows)
    rows: int,
    cols: int,
    p_hbm,
    r_hbm,
    bands_hbm,
    out_ref,
    pslab,
    rslab,
    bslab,
    ta,
    tb,
    sems,
):
    j = pl.program_id(0)
    nb = pl.num_programs(0)
    height = rows + 2 * (p_halo + m_rows)
    r2p = rows + 2 * p_halo

    def copies(jj, slot):
        return (
            pltpu.make_async_copy(
                p_hbm.at[pl.ds(jj * rows, height), :],
                pslab.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                r_hbm.at[pl.ds(jj * rows, height), :],
                rslab.at[slot],
                sems.at[slot, 1],
            ),
            pltpu.make_async_copy(
                bands_hbm.at[:, pl.ds(jj * rows, height), :],
                bslab.at[slot],
                sems.at[slot, 2],
            ),
        )

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

    dtype = out_ref.dtype
    th = jnp.asarray(theta, dtype)
    dl = jnp.asarray(delta, dtype)
    sg = jnp.asarray(delta / 2.0, dtype)
    sh = [jnp.asarray(v, dtype) for v in shifts]

    def matvec(v_full):
        """Banded mat-vec of the full-height plane VALUE ``v_full`` on
        output rows [m_rows, m_rows + r2p) — shared-roll shifts
        (_util.plane_matvec: one roll per distinct off % cols)."""
        return plane_matvec(
            lambda d: bslab[slot, d, pl.ds(m_rows, r2p), :],
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
        """Write [T_0..T_{width-1}](A) applied to the slab's vector
        into out_ref[base_idx : base_idx + width]."""
        load0 = slab_loader(src_slab)
        out_ref[base_idx] = src_slab[
            slot, pl.ds(m_rows + p_halo, rows), :
        ]
        if width == 1:
            return
        t0c = load0(m_rows, r2p)
        v0 = src_slab[slot]
        if sh:
            t1 = (matvec(v0) - sh[0] * t0c) / sg
        else:
            t1 = (matvec(v0) - th * t0c) / dl
        ta[pl.ds(m_rows, r2p), :] = t1
        out_ref[base_idx + 1] = t1[p_halo : p_halo + rows, :]
        # three-term recurrence: t_i from t_{i-1} (cur) and t_{i-2}
        # (prev); buffers ping-pong, reads complete before overwrite
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
            out_ref[base_idx + i] = ti[p_halo : p_halo + rows, :]
            prev_load, cur = cur_load, nxt

    gen(pslab, wp, 0)
    gen(rslab, wr, wp)


def _powers_geometry(offsets, s: int, rows: int, cols: int, dtype, n: int):
    """(n_p, p_rows, p_halo, m_rows, pm, height) — margins rounded up
    to the sublane tile: Mosaic requires DMA slice offsets/heights
    along the second-minor dim to be tile-aligned; extra halo rows just
    carry more valid neighbour data (or zeros at the array ends),
    costing only redundant compute."""
    wp, wr = s + 1, s
    n_p = round_up(n, rows * cols)
    p_rows = max(abs(o) // cols + 1 for o in offsets)
    sub = sublanes(dtype)
    p_halo = round_up(max(wp - 1, wr - 1) * p_rows, sub)
    m_rows = round_up(p_rows, sub)  # read margin for one application
    pm = p_halo + m_rows
    return n_p, p_rows, p_halo, m_rows, pm, rows + 2 * pm


def sstep_powers_band_planes(
    bands, *, offsets, s: int, rows: int = 256, cols: int = 512,
    align_dtype=None,
):
    """Pre-padded band planes for :func:`dia_sstep_basis_planes` —
    build ONCE per solve. The per-call re-pad inside a while loop is
    not hoisted by XLA (it grows memory) and costs 2*ndiag*N words of
    extra HBM traffic per s-step block (cf. stream2d_band_planes).

    ``align_dtype`` overrides the dtype used for the sublane-alignment
    geometry: when the planes will be narrowed (bf16 band planes with
    f32 state, cgx.ops.sstep_stream ``bands_dtype``), margins must be
    aligned to the NARROWER dtype's taller sublane tile so the fused
    kernels' DMA slices stay tile-aligned for every streamed array."""
    ndiag, n = bands.shape
    n_p, _, _, _, pm, _ = _powers_geometry(
        offsets, s, rows, cols, align_dtype or bands.dtype, n
    )
    return jnp.pad(
        bands, ((0, 0), (pm * cols, pm * cols + (n_p - n)))
    ).reshape(ndiag, -1, cols)


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "s", "theta", "delta", "shifts", "rows", "cols",
        "interpret",
    ),
)
@no_x64_trace
def dia_sstep_basis(
    bands: jnp.ndarray,
    p: jnp.ndarray,
    r: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    s: int,
    theta: float,
    delta: float,
    shifts: Tuple[float, ...] = (),
    rows: int = 256,
    cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """The (2s+1, n) s-step Krylov basis in one HBM pass over the bands.

    Rows 0..s are the Chebyshev (or scaled-Newton, when ``shifts`` is
    non-empty) columns on ``p``; rows s+1..2s the ones on ``r`` —
    exactly the stack ``sstep_cg_loop`` builds from 2s-1 separate
    mat-vecs (s on p, s-1 on r — cgx/solver/sstep.py). Chained use
    should pre-build the band planes (``sstep_powers_band_planes``)
    and call :func:`dia_sstep_basis_planes`.
    """
    bands_pl = sstep_powers_band_planes(
        bands, offsets=offsets, s=s, rows=rows, cols=cols
    )
    return dia_sstep_basis_planes(
        bands_pl, p, r, offsets=offsets, s=s, theta=theta, delta=delta,
        shifts=shifts, rows=rows, cols=cols, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "s", "theta", "delta", "shifts", "rows", "cols",
        "interpret",
    ),
)
@no_x64_trace
def dia_sstep_basis_planes(
    bands_pl: jnp.ndarray,
    p: jnp.ndarray,
    r: jnp.ndarray,
    *,
    offsets: Tuple[int, ...],
    s: int,
    theta: float,
    delta: float,
    shifts: Tuple[float, ...] = (),
    rows: int = 256,
    cols: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`dia_sstep_basis` taking PRE-PADDED band planes — the
    chained-use entry (only the p/r halo pads remain per call)."""
    assert cols % LANES == 0, "cols must be lane-aligned"
    ndiag = bands_pl.shape[0]
    n = p.shape[0]
    assert p.shape == (n,) and r.shape == (n,)
    wp, wr = s + 1, s
    n_p, p_rows, p_halo, m_rows, pm, height = _powers_geometry(
        offsets, s, rows, cols, bands_pl.dtype, n
    )
    assert bands_pl.shape[1] * cols == n_p + 2 * pm * cols, (
        f"band planes {bands_pl.shape} do not match geometry for "
        f"n={n} s={s} rows={rows} cols={cols}"
    )

    def plane(v):
        return jnp.pad(v, (pm * cols, pm * cols + (n_p - n))).reshape(
            -1, cols
        )

    p_pl = plane(p)
    r_pl = plane(r)

    m = 2 * s + 1
    grid = (n_p // (rows * cols),)
    v = pl.pallas_call(
        functools.partial(
            _powers_kernel, offsets, wp, wr, theta, delta, tuple(shifts),
            m_rows, p_halo, rows, cols,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # p plane stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # r plane
            pl.BlockSpec(memory_space=pl.ANY),  # bands planes
        ],
        out_specs=pl.BlockSpec(
            (m, rows, cols), lambda j: (0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n_p // cols, cols), bands_pl.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, height, cols), bands_pl.dtype),         # pslab
            pltpu.VMEM((2, height, cols), bands_pl.dtype),         # rslab
            pltpu.VMEM((2, ndiag, height, cols), bands_pl.dtype),  # bslab
            pltpu.VMEM((height, cols), bands_pl.dtype),            # ta
            pltpu.VMEM((height, cols), bands_pl.dtype),            # tb
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=(wp + wr - 2) * (2 * ndiag + 4) * n_p,
            bytes_accessed=(ndiag + 2 + m) * n_p * bands_pl.dtype.itemsize,
            transcendentals=0,
        ),
    )(p_pl, r_pl, bands_pl)
    return v.reshape(m, n_p)[:, :n]
