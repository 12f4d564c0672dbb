"""Sharded fused streaming s-step CG: the Krylov basis never touches
HBM on ANY shard, and the mesh pays ONE Gram psum per s iterations.

This composes the framework's two communication-avoiding halves:

- the OUTER (inter-chip) half is the deep-halo matrix-powers scheme
  (cgx.parallel.sharded_cg._DiaPowersHalo / Demmel-Hoemmen): each
  shard receives enough neighbour rows up front that the whole
  s-block's basis is built locally — 2 ppermutes (p and r edges ride
  stacked per direction) + 1 Gram psum per s iterations, versus the
  reference recurrence's 2 psums + 1 halo exchange PER iteration
  (/root/reference/code/MPI/cg.cc:106,117,135);
- the INNER (per-chip) half is the fused two-kernel streaming block
  (cgx.ops.sstep_stream): the gram kernel regenerates the basis
  block-locally in VMEM while accumulating G = V V^T double-f32, the
  recover kernel regenerates it again and writes only the x/r/p
  coefficient combinations — (2*ndiag + 8)·N_loc words per s
  iterations instead of the per-iteration stream kernel's 15·N_loc
  (at s=4/ndiag=5 that is 4.5N vs 15N words per iteration, measured
  2.03x end-to-end on the v5e at N=1.024e7, BENCHMARKS round 4).

The two halves share one geometry: the fused kernels already read p/r
as planes with ``pm`` halo rows top and bottom (zeros at the array
ends, single-device). Here those same halo rows hold NEIGHBOUR data —
refreshed by one stacked ppermute per direction per block — and the
band planes' halo rows hold the neighbours' band rows (exchanged ONCE
per solve, hoisted above the while loop). The validity-shrink argument
is unchanged: generating the 2s+1 basis columns consumes at most
``p_halo`` rows of reach from each slab edge, and the interior rows the
Gram/recover kernels touch start ``pm = p_halo + m_rows`` rows in.

Per-shard Gram contributions accumulate over interior rows only (the
gram kernel's grid covers exactly the ``nb*rows`` interior rows;
vbuf holds no halo), so shards partition the global rows and the psum
of the per-shard (hi, lo) double-f32 pairs is the global Gram. The
pairs are summed componentwise across the mesh and folded AFTER the
psum — each shard's in-kernel compensation is preserved; the cross-
shard fold adds one eps-relative rounding per entry (log2(P) deep),
which is the same order as the single-device fold.

Geometry constraints (checked at build by
:func:`fused_plane_geometry`): the shard interior must tile exactly
into (rows, cols) blocks — padding WITHIN a middle shard would break
global band adjacency — and the ``pm*cols``-element halo must fit in
one neighbour shard. When no (rows, cols) satisfies them the build
raises with the concrete numbers; ``sstep_powers='deephalo'`` has no
such constraint and is the documented fallback.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.ops._util import sublanes
from cgx.ops.dia_powers import _powers_geometry
from cgx.ops.sstep_stream import _sstep_gram, _sstep_recover
from cgx.solver.cg import CGResult

# Candidate lane widths for the plane layout, widest first: 512 is the
# tuned single-device default (results/stream_kernel_sweep.txt); all
# must be multiples of the 128-lane vreg width for the real lowering.
_COLS_CANDIDATES = (512, 256, 128)


def fused_plane_geometry(
    offsets: Tuple[int, ...],
    s: int,
    n_loc: int,
    dtype,
    bands_dtype=None,
    cols_candidates: Tuple[int, ...] = _COLS_CANDIDATES,
) -> Tuple[int, int, int]:
    """Pick a (rows, cols, pm) plane tiling of an ``n_loc``-row shard
    for the fused s-step kernels, or raise ``ValueError``.

    Requirements (all hard):
    - ``n_loc % (rows * cols) == 0``: middle shards cannot carry tail
      padding — zero rows between shard i's data and shard i+1's halo
      would corrupt the band reach across the interface;
    - ``rows >= pm``: the recover kernel's in-place aliasing hazard
      bound (block j's interior write vs block j+2's halo read —
      cgx.ops.sstep_stream._sstep_recover);
    - ``pm * cols <= n_loc``: the halo must come from the IMMEDIATE
      neighbour (one ppermute per direction);
    - ``rows % sublanes(align) == 0``: Mosaic DMA slice alignment.

    Among valid tilings, prefers the widest cols and the smallest
    rows >= 256 (the tuned default block height), falling back to the
    largest valid rows below 256.
    """
    align = dtype
    if bands_dtype is not None and (
        jnp.dtype(bands_dtype).itemsize < jnp.dtype(dtype).itemsize
    ):
        align = bands_dtype
    sub = sublanes(align)
    tried = []
    for cols in cols_candidates:
        if n_loc % cols:
            tried.append(f"cols={cols}: n_loc % cols != 0")
            continue
        ni = n_loc // cols
        # pm depends on (offsets, s, cols, align) only — rows=sub is a
        # placeholder (cf. _powers_geometry: p_halo/m_rows are
        # rows-independent)
        _, _, _, _, pm, _ = _powers_geometry(
            tuple(offsets), int(s), sub, cols, align, n_loc
        )
        if pm * cols > n_loc:
            tried.append(f"cols={cols}: halo pm*cols={pm * cols} > n_loc")
            continue
        cands = [
            r for r in range(sub, ni + 1, sub)
            if ni % r == 0 and r >= pm
        ]
        if not cands:
            tried.append(
                f"cols={cols}: no rows in [{max(pm, sub)}, {ni}] "
                f"divides interior {ni} (pm={pm})"
            )
            continue
        preferred = [r for r in cands if r >= 256]
        rows = min(preferred) if preferred else max(cands)
        return rows, cols, pm
    raise ValueError(
        "sstep_powers='fused': no (rows, cols) plane tiling of the "
        f"shard (n_loc={n_loc}, offsets={tuple(offsets)}, s={s}) "
        f"satisfies the fused-kernel constraints [{'; '.join(tried)}]. "
        "Use sstep_powers='deephalo' (no tiling constraint), fewer "
        "shards, or a shard-divisible problem size."
    )


class _SStepFusedLoop:
    """Per-shard loop body for ``sstep_powers='fused'`` — a drop-in
    for ``_SStepLoop`` in ``make_sharded_solver``'s shard_map program:
    ``(tree, b_loc, x0_loc, tol, nearzero) -> CGResult`` with a local
    ``x`` and replicated scalars.

    ``tree`` is the flat local band stack (ndiag, n_loc) of the DIA
    halo strategy. Per s-block collectives: 2 ppermutes (stacked p/r
    edges) + 1 psum of the (2, m, m) Gram pair. Setup collectives
    (once per solve): 2 band-edge ppermutes, 2 x0-edge ppermutes for
    the initial residual, 1 pmax (exact pow2 RHS prescale), 1 psum
    (||r0||^2).
    """

    def __init__(self, axis: str, offsets: Tuple[int, ...], n_loc: int,
                 n_shards: int, s: int, maxiter: int, theta: float,
                 delta: float, shifts: Tuple[float, ...], rows: int,
                 cols: int, pm: int, bands_dtype: Optional[str],
                 interpret: bool):
        self.axis = axis
        self.offsets = tuple(int(o) for o in offsets)
        self.n_loc = int(n_loc)
        self.n_shards = int(n_shards)
        self.s = int(s)
        self.maxiter = int(maxiter)
        self.theta = float(theta)
        self.delta = float(delta)
        self.shifts = tuple(float(v) for v in shifts)
        self.rows = int(rows)
        self.cols = int(cols)
        self.pm = int(pm)
        self.bands_dtype = bands_dtype
        self.interpret = bool(interpret)
        self.h = max(abs(o) for o in self.offsets)
        if self.pm * self.cols > self.n_loc:
            raise ValueError(
                f"halo depth pm*cols={self.pm * self.cols} exceeds the "
                f"shard size {self.n_loc}"
            )
        if self.n_loc % (self.rows * self.cols):
            raise ValueError(
                f"shard size {self.n_loc} does not tile into "
                f"({self.rows}, {self.cols}) blocks"
            )

    def _perms(self):
        right = [(i, i + 1) for i in range(self.n_shards - 1)]
        left = [(i + 1, i) for i in range(self.n_shards - 1)]
        return right, left

    def _mv_ext(self, bands_ext, v_ext):
        """Local banded mat-vec on the d-extended domain: exact for
        all n_loc interior rows (the halo provides the reach; at the
        global ends ppermute delivered zeros, matching the zero-padded
        global operator)."""
        d = self.pm * self.cols
        h = self.h
        vp = jnp.pad(v_ext, (h, h))
        y = jnp.zeros((self.n_loc,), v_ext.dtype)
        for di, off in enumerate(self.offsets):
            y = y + bands_ext[di, d:d + self.n_loc] * (
                jax.lax.dynamic_slice_in_dim(
                    vp, h + d + off, self.n_loc, axis=0
                )
            )
        return y

    def __call__(self, tree, b, x0, tol, nearzero):
        from cgx.solver.sstep import _basis_matrix, replay_block

        bands = tree
        dtype = b.dtype
        f32 = jnp.float32
        s = self.s
        m = 2 * s + 1
        pm, rows, cols = self.pm, self.rows, self.cols
        d = pm * cols
        ni = self.n_loc // cols  # interior plane rows
        axis = self.axis
        right_perm, left_perm = self._perms()

        bdt = (
            None if self.bands_dtype is None
            else jnp.dtype(self.bands_dtype)
        )
        if bdt is not None and bdt != dtype:
            # round ONCE so the r0 mat-vec and the streamed planes use
            # the same (possibly rounded) operator — bitwise no-op
            # when every band value is bdt-exact, which is what the
            # build-time 'auto' resolution guarantees
            bands = bands.astype(bdt).astype(dtype)
        else:
            bdt = None

        # band halo exchange: ONCE per solve, hoisted above the loop
        blh = jax.lax.ppermute(bands[:, -d:], axis, right_perm)
        brh = jax.lax.ppermute(bands[:, :d], axis, left_perm)
        bands_ext = jnp.concatenate([blh, bands, brh], axis=1)
        bands_pl = bands_ext.reshape(bands.shape[0], -1, cols)
        if bdt is not None:
            bands_pl = bands_pl.astype(bdt)

        # exact pow2 RHS prescale, GLOBAL max (cf. pow2_rhs_scale:
        # the replay's products of Gram entries overflow f32 for
        # huge-norm b; scaling by a power of two is bitwise-neutral
        # otherwise). pmax is exact — every shard derives the same
        # exponent.
        amax = jnp.max(jnp.abs(b))
        amax = jnp.maximum(amax, jnp.max(jnp.abs(x0)))
        amax = jax.lax.pmax(amax, axis)
        _, e = jnp.frexp(amax)
        one = jnp.ones((), dtype)
        down, up = jnp.ldexp(one, -e), jnp.ldexp(one, e)
        b = b * down
        x0 = x0 * down
        tol32 = jnp.asarray(tol, f32) * down.astype(f32)
        nz32 = jnp.asarray(nearzero, f32)

        # r0 = b - A x0 on the d-extended domain (2 ppermutes)
        xlh = jax.lax.ppermute(x0[-d:], axis, right_perm)
        xrh = jax.lax.ppermute(x0[:d], axis, left_perm)
        r0 = b - self._mv_ext(
            bands_ext, jnp.concatenate([xlh, x0, xrh])
        )
        rs0 = jax.lax.psum(
            jnp.sum(r0.astype(f32) * r0.astype(f32)), axis
        )
        pre_conv = jnp.logical_or(jnp.sqrt(rs0) < tol32, rs0 == 0)

        x_pl0 = x0.reshape(ni, cols)
        r_pl0 = jnp.pad(r0.reshape(ni, cols), ((pm, pm), (0, 0)))
        p_pl0 = r_pl0
        bmat = jnp.asarray(
            _basis_matrix(s, self.theta, self.delta, np.float64,
                          self.shifts),
            f32,
        )

        def cond(state):
            k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = state
            return jnp.logical_and(
                k < self.maxiter,
                jnp.logical_and(
                    jnp.logical_not(conv), jnp.logical_not(brk)
                ),
            )

        def body(state):
            k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = state
            # refresh the pm halo rows from the neighbours' interiors
            # (the recover kernel zeroed them): p and r edges ride
            # STACKED per direction — 2 ppermutes per block, the
            # latency term the deep-halo scheme exists to minimize
            tops = jnp.stack([p_pl[ni:ni + pm], r_pl[ni:ni + pm]])
            bots = jnp.stack([p_pl[pm:2 * pm], r_pl[pm:2 * pm]])
            lh = jax.lax.ppermute(tops, axis, right_perm)
            rh = jax.lax.ppermute(bots, axis, left_perm)
            p_pl = jax.lax.dynamic_update_slice(p_pl, lh[0], (0, 0))
            p_pl = jax.lax.dynamic_update_slice(
                p_pl, rh[0], (pm + ni, 0)
            )
            r_pl = jax.lax.dynamic_update_slice(r_pl, lh[1], (0, 0))
            r_pl = jax.lax.dynamic_update_slice(
                r_pl, rh[1], (pm + ni, 0)
            )

            g2 = _sstep_gram(
                bands_pl, p_pl, r_pl, offsets=self.offsets, s=s,
                theta=self.theta, delta=self.delta, shifts=self.shifts,
                rows=rows, cols=cols, interpret=self.interpret,
            )
            # psum the (hi, lo) pair componentwise, fold after: each
            # shard's double-f32 compensation survives the reduction
            g2 = jax.lax.psum(g2, axis)
            g = g2[0] + g2[1]

            xc, dd, cc, k, rs, rsnew, conv, brk = replay_block(
                g, bmat, s, k, rsnew, conv, brk,
                tol=tol32, nearzero=nz32, maxiter=self.maxiter,
            )
            coef = jnp.stack([xc, dd, cc]).astype(dtype)
            x_pl, r_pl, p_pl = _sstep_recover(
                bands_pl, p_pl, r_pl, x_pl, coef, offsets=self.offsets,
                s=s, theta=self.theta, delta=self.delta,
                shifts=self.shifts, rows=rows, cols=cols,
                interpret=self.interpret,
            )
            return (k, x_pl, p_pl, r_pl, rs, rsnew, conv, brk)

        state0 = (
            jnp.asarray(0, jnp.int32), x_pl0, p_pl0, r_pl0,
            rs0, rs0, pre_conv, jnp.asarray(False),
        )
        k, x_pl, p_pl, r_pl, rsold, rsnew, conv, brk = (
            jax.lax.while_loop(cond, body, state0)
        )
        return CGResult(
            x=x_pl.reshape(-1) * up,
            iterations=k,
            residual_norm=(jnp.sqrt(rsnew) * up.astype(f32)).astype(
                dtype
            ),
            converged=conv,
            rsold=(rsold * (up * up).astype(f32)).astype(dtype),
            history=jnp.zeros((0,), dtype),
            breakdown=brk,
        )

    def _key(self):
        return (
            type(self), self.axis, self.offsets, self.n_loc,
            self.n_shards, self.s, self.maxiter, self.theta,
            self.delta, self.shifts, self.rows, self.cols, self.pm,
            self.bands_dtype, self.interpret,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()
