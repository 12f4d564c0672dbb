"""Distributed CG over a 1-D device mesh (reference L3, TPU-native).

The reference's per-iteration communication pattern (SURVEY §2.5) is:

    2 x MPI_Allreduce(SUM) of one scalar   (cg.cc:106, 117)
    1 x MPI_Allgatherv of the N-vector p   (cg.cc:135)

Here the whole solve — loop, collectives, convergence test — is ONE
jitted ``shard_map`` program. The collectives compile to ICI
transfers; no per-iteration host synchronisation exists at all
(the CUDA variant paid 2 D2H copies + 2 device syncs per iteration,
cg.cu:245-260).

Three communication strategies:

- ``allgather``      exact comm-pattern parity with the reference: two
                     ``psum`` scalars + one tiled ``all_gather`` of p
                     per iteration. Works for every operator format.
- ``reducescatter``  the symmetry trick of the reference's coalesced
                     CUDA kernel (MatVecT, cg.cu:63-110) reborn as a
                     *communication* strategy: since A = A^T, each
                     shard computes a full-length partial
                     ``A_loc^T @ p_loc`` and a ``psum_scatter``
                     replaces gather-then-matvec. Dense only.
- ``halo``           for banded (DIA) matrices: the matvec needs only
                     a max-bandwidth-wide halo of p, exchanged with
                     mesh neighbours via ``ppermute`` — O(bandwidth)
                     bytes instead of O(N) per iteration. This is the
                     TPU-native fast path (ICI neighbour links).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.utils.collectives import run_recorded
from cgx.mats.containers import (
    COOMatrix,
    CSRMatrix,
    DenseMatrix,
    DIAMatrix,
    ELLMatrix,
)
from cgx.ops.reduce import vdot
from cgx.parallel.mesh import ROWS_AXIS, make_mesh
from cgx.parallel.partition import pad_bands, pad_dense, pad_vector, padded_size
from cgx.solver.cg import CGResult, cg_loop


# ---------------------------------------------------------------------------
# Local matvecs (one per strategy/format). Each is a static callable
# taking (operator_tree, p_local) inside shard_map.
# ---------------------------------------------------------------------------


class _DenseAllGather:
    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, a_loc, p_loc):
        p_full = jax.lax.all_gather(p_loc, self.axis, tiled=True)
        return a_loc @ p_full

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


class _DenseOzakiAllGather:
    """Reference MPI parity for dense fp64 on TPU: row-decomposed A,
    per-iteration all_gather of p (cg.cc:135-136), local mat-vec — but
    the local product runs as int8 Ozaki slices on the MXU
    (cgx/ops/ozaki.py, fp64-quality at 23x the emulated-fp64 rate)
    instead of an emulated fp64 matmul. Identical collective signature
    to _DenseAllGather (1 all_gather per apply)."""

    def __init__(self, axis: str, num_slices: int = 8):
        self.axis = axis
        self.num_slices = num_slices

    def __call__(self, op, p_loc):
        from cgx.ops.ozaki import _ozaki_apply

        c_loc, sigma_loc = op
        p_full = jax.lax.all_gather(p_loc, self.axis, tiled=True)
        return _ozaki_apply(
            c_loc, sigma_loc, p_full, num_slices=self.num_slices
        )

    def __hash__(self):
        return hash((type(self), self.axis, self.num_slices))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other.axis == self.axis
            and other.num_slices == self.num_slices
        )


class _DenseReduceScatter:
    """Symmetric-A partial-products strategy: Ap = psum_scatter(A_loc^T p_loc)."""

    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, a_loc, p_loc):
        partial_full = p_loc @ a_loc  # (N,) = A_loc^T @ p_loc, A symmetric
        return jax.lax.psum_scatter(
            partial_full, self.axis, scatter_dimension=0, tiled=True
        )

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


class _DiaAllGather:
    def __init__(self, axis: str, offsets: tuple, n_loc: int):
        self.axis = axis
        self.offsets = offsets
        self.n_loc = n_loc

    def __call__(self, bands_loc, p_loc):
        p_full = jax.lax.all_gather(p_loc, self.axis, tiled=True)
        start = jax.lax.axis_index(self.axis) * self.n_loc
        pad = max(max(abs(o) for o in self.offsets), 1)
        widths = ((pad, pad),) + ((0, 0),) * (p_loc.ndim - 1)
        p_pad = jnp.pad(p_full, widths)
        y = jnp.zeros_like(p_loc)
        for d, off in enumerate(self.offsets):
            shifted = jax.lax.dynamic_slice_in_dim(
                p_pad, pad + start + off, self.n_loc, axis=0
            )
            band = bands_loc[d]
            if p_loc.ndim == 2:
                band = band[:, None]
            y = y + band * shifted
        return y

    def __hash__(self):
        return hash((type(self), self.axis, self.offsets, self.n_loc))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and (other.axis, other.offsets, other.n_loc)
            == (self.axis, self.offsets, self.n_loc)
        )


class _DiaHalo:
    """Banded matvec with ppermute halo exchange: O(halo) comm/iter.

    Left halo = last h entries of the left neighbour's shard; right
    halo = first h entries of the right neighbour's. Edge shards
    receive zeros (ppermute zero-fills missing links), which matches
    the matrix having no entries beyond the boundary.

    Works on 1-D shards (n_loc,) and on 2-D multi-RHS blocks
    (n_loc, r_loc) — rows are always axis 0.

    ``local_kernel`` selects the LOCAL mat-vec implementation (the
    collective signature — 2 ppermutes — is identical either way):

    - 'xla': shifted dynamic slices of the extended vector (default;
      the only fp64-capable path — Mosaic has no fp64). Operand:
      the local flat bands (ndiag, n_loc).
    - 'stream2d': the Pallas HBM-streaming kernel
      (:func:`cgx.ops.dia_spmv.dia_matvec_stream2d_planes`) on the
      local shard. Above ~2e6 fp32 unknowns per shard XLA's fusion
      schedule drops to 25-30% of HBM roofline while the streaming
      kernel holds ~50% (BENCHMARKS round-2 session 8) — on a real pod
      each chip's shard of an N=1e9 problem sits exactly there.
      Operand: PRE-PADDED band planes (ndiag, rows_lp, cols) built by
      _build_op — XLA will not hoist a per-iteration band re-pad out
      of the while loop, and the re-pad costs 2*ndiag*N words of
      traffic (scripts/bw_control3.py). The kernel computes the
      zero-boundary local mat-vec; the top/bottom h rows (the only
      rows that see the halo) are then recomputed exactly from the
      extended vector and patched in — O(ndiag*h) extra work.
    """

    def __init__(self, axis: str, offsets: tuple, n_loc: int, n_shards: int,
                 local_kernel: str = "xla",
                 # per-SHARD tile: stays 256 (shards are smaller than the
                 # single-device problems the 512-row preference was raced
                 # on — results/sstep_shape_table.txt; unraced here)
                 rows: int = 256, cols: int = 512):
        self.axis = axis
        self.offsets = offsets
        self.n_loc = n_loc
        self.n_shards = n_shards
        self.local_kernel = local_kernel
        self.rows = rows
        self.cols = cols
        if local_kernel not in ("xla", "stream2d"):
            raise ValueError(f"unknown local_kernel {local_kernel!r}")
        self.halo = max(max(abs(o) for o in offsets), 1)
        if self.halo > n_loc:
            raise ValueError(
                f"halo {self.halo} exceeds shard size {n_loc}; "
                "use strategy='allgather' or fewer shards"
            )

    def _edge_rows(self, bands_loc, p_ext, start: int):
        """Exact rows [start, start+h) of the halo'd mat-vec."""
        h = self.halo
        y = jnp.zeros_like(p_ext[:h])
        for d, off in enumerate(self.offsets):
            shifted = jax.lax.dynamic_slice_in_dim(
                p_ext, h + start + off, h, axis=0
            )
            y = y + bands_loc[d, start : start + h] * shifted
        return y

    def __call__(self, bands_loc, p_loc):
        h, n_loc = self.halo, self.n_loc
        right_perm = [(i, i + 1) for i in range(self.n_shards - 1)]
        left_perm = [(i + 1, i) for i in range(self.n_shards - 1)]
        # halo coming from the LEFT neighbour (their top edge = last h)
        left_halo = jax.lax.ppermute(p_loc[-h:], self.axis, right_perm)
        # halo coming from the RIGHT neighbour (their bottom edge = first h)
        right_halo = jax.lax.ppermute(p_loc[:h], self.axis, left_perm)
        p_ext = jnp.concatenate([left_halo, p_loc, right_halo], axis=0)
        if self.local_kernel == "stream2d":
            # bands_loc is the PRE-PADDED plane stack (ndiag, rows_lp,
            # cols); the flat band values are its first n_loc entries
            from cgx.ops.dia_spmv import dia_matvec_stream2d_planes

            y = dia_matvec_stream2d_planes(
                bands_loc, p_loc, offsets=self.offsets,
                rows=self.rows, cols=self.cols,
                interpret=jax.default_backend() == "cpu",
            )
            bands_flat = bands_loc.reshape(bands_loc.shape[0], -1)
            # zero-boundary kernel result is exact for rows [h, n-h);
            # patch the halo-visible edge strips with the full formula
            y = y.at[:h].set(self._edge_rows(bands_flat, p_ext, 0))
            y = y.at[n_loc - h :].set(
                self._edge_rows(bands_flat, p_ext, n_loc - h)
            )
            return y
        y = jnp.zeros_like(p_loc)
        for d, off in enumerate(self.offsets):
            shifted = jax.lax.dynamic_slice_in_dim(p_ext, h + off, n_loc, axis=0)
            band = bands_loc[d]
            if p_loc.ndim == 2:
                band = band[:, None]
            y = y + band * shifted
        return y

    def __hash__(self):
        return hash((type(self), self.axis, self.offsets, self.n_loc,
                     self.n_shards, self.local_kernel, self.rows,
                     self.cols))

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and (other.axis, other.offsets, other.n_loc, other.n_shards,
                 other.local_kernel, other.rows, other.cols)
            == (self.axis, self.offsets, self.n_loc, self.n_shards,
                self.local_kernel, self.rows, self.cols)
        )


class _DeepHaloBasis:
    """Matrix-powers s-step basis across shards: ONE depth-(s*h) halo
    exchange per s-iteration block instead of 2s-1 depth-h exchanges.

    This is the distributed half of the communication-avoiding story
    (Demmel/Hoemmen matrix-powers; cgx.ops.dia_powers is the
    single-chip HBM half): each shard receives s*h rows from each
    neighbour up front, then builds all 2s+1 Chebyshev/Newton basis
    columns locally on the extended domain — each operator application
    shrinks the trustworthy region by h rows from the halo edges, and
    the halo depth is sized so the central n_loc rows stay exact.
    Message count per s iterations: 2 ppermutes (p and r edges
    stacked per direction) + 1 Gram psum, versus 2(2s-1) ppermutes +
    1 psum with per-mat-vec halo exchange (latency-bound
    meshes: the alpha*log2(p) term of the reference's cost model,
    MPI-hard slide, drops s-fold).

    Band rows for the extended domain are exchanged ONCE per solve
    (extend_bands, hoisted outside the while loop by _SStepLoop).
    """

    def __init__(self, axis: str, offsets: tuple, n_loc: int,
                 n_shards: int, s: int, theta: float, delta: float,
                 shifts: tuple = ()):
        self.axis = axis
        self.offsets = tuple(offsets)
        self.n_loc = int(n_loc)
        self.n_shards = int(n_shards)
        self.s = int(s)
        self.theta = float(theta)
        self.delta = float(delta)
        self.shifts = tuple(float(v) for v in shifts)
        self.h = max(max(abs(o) for o in offsets), 1)
        self.depth = self.s * self.h
        if self.depth > self.n_loc:
            raise ValueError(
                f"matrix-powers halo depth s*h = {self.depth} exceeds "
                f"shard size {self.n_loc}; reduce sstep_s, use fewer "
                "shards, or sstep_powers='off'"
            )

    def _perms(self):
        right_perm = [(i, i + 1) for i in range(self.n_shards - 1)]
        left_perm = [(i + 1, i) for i in range(self.n_shards - 1)]
        return right_perm, left_perm

    def _exchange2(self, p_loc, r_loc):
        """Extend BOTH vectors with one ppermute per direction: the
        edges of p and r ride stacked in the same message (2 launches
        per block, not 4 — the latency term is the whole point)."""
        d = self.depth
        right_perm, left_perm = self._perms()
        tops = jnp.stack([p_loc[-d:], r_loc[-d:]])
        bots = jnp.stack([p_loc[:d], r_loc[:d]])
        lh = jax.lax.ppermute(tops, self.axis, right_perm)
        rh = jax.lax.ppermute(bots, self.axis, left_perm)
        p_ext = jnp.concatenate([lh[0], p_loc, rh[0]], axis=0)
        r_ext = jnp.concatenate([lh[1], r_loc, rh[1]], axis=0)
        return p_ext, r_ext

    def extend_bands(self, bands_loc):
        d = self.depth
        right_perm, left_perm = self._perms()
        lh = jax.lax.ppermute(bands_loc[:, -d:], self.axis, right_perm)
        rh = jax.lax.ppermute(bands_loc[:, :d], self.axis, left_perm)
        return jnp.concatenate([lh, bands_loc, rh], axis=1)

    def __call__(self, tree, p_loc, r_loc):
        from cgx.solver.sstep import basis_columns_fn

        _, bands_ext = tree
        d = self.depth
        ell = self.n_loc + 2 * d
        h = self.h

        def mv_ext(v):
            # local banded matvec on the extended domain; the zero
            # padding beyond the halo feeds only the h edge rows that
            # the validity-shrink argument already discards
            vp = jnp.pad(v, (h, h))
            y = jnp.zeros_like(v)
            for di, off in enumerate(self.offsets):
                y = y + bands_ext[di] * jax.lax.dynamic_slice_in_dim(
                    vp, h + off, ell, axis=0
                )
            return y

        cols = basis_columns_fn(
            mv_ext, p_loc.dtype, self.theta, self.delta, self.shifts
        )
        p_ext, r_ext = self._exchange2(p_loc, r_loc)
        v = jnp.stack(
            cols(p_ext, self.s + 1) + cols(r_ext, self.s), axis=0
        )
        return v[:, d : d + self.n_loc]

    def _key(self):
        return (
            type(self), self.axis, self.offsets, self.n_loc,
            self.n_shards, self.s, self.theta, self.delta, self.shifts,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


class _CsrAllGather:
    """CSR rows-sharded matvec. Each shard holds its row block's
    triplets as flat (values, column ids, LOCAL row ids) planes, padded
    to the max per-shard nnz with zero-value entries aimed at row 0
    (harmless in the sum). The reference's uneven `partition_matrix`
    blocks (cg.cc:236-268) become equal nnz-padded planes so the
    program is SPMD; the per-row reduction is a segment_sum — no
    atomics (contrast the CUDA kernels' atomicAdd merge, cg.cu:58)."""

    def __init__(self, axis: str, n_loc: int):
        self.axis = axis
        self.n_loc = n_loc

    def __call__(self, op, p_loc):
        values_loc, indices_loc, rowids_loc = op
        p_full = jax.lax.all_gather(p_loc, self.axis, tiled=True)
        prod = values_loc * jnp.take(p_full, indices_loc, axis=0)
        return jax.ops.segment_sum(prod, rowids_loc, num_segments=self.n_loc)

    def __hash__(self):
        return hash((type(self), self.axis, self.n_loc))

    def __eq__(self, other):
        return type(other) is type(self) and (other.axis, other.n_loc) == (
            self.axis,
            self.n_loc,
        )


class _EllAllGather:
    """ELLPACK rows-sharded matvec: gather rows of the replicated
    (all-gathered) p through the local index plane."""

    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, op, p_loc):
        values_loc, indices_loc = op
        p_full = jax.lax.all_gather(p_loc, self.axis, tiled=True)
        gathered = jnp.take(p_full, indices_loc, axis=0)  # (n_loc, K)
        return jnp.sum(values_loc * gathered, axis=1)

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


class _PsumDot:
    """<a, b> with local VPU accumulation + one psum (the reference's
    cblas_ddot + MPI_Allreduce pair, cg.cc:105-106/116-117)."""

    def __init__(self, axis: str, precision):
        self.axis = axis
        self.precision = precision

    def __call__(self, a, b):
        return jax.lax.psum(vdot(a, b, precision=self.precision), self.axis)

    def __hash__(self):
        return hash((type(self), self.axis, str(self.precision)))

    def __eq__(self, other):
        return type(other) is type(self) and (
            other.axis,
            str(other.precision),
        ) == (self.axis, str(self.precision))


class _PsumDots:
    """Fused multi-pair reduction: all local VPU dots stacked into ONE
    psum of a short vector — the Chronopoulos-Gear single-all-reduce
    (vs the reference's two separate MPI_Allreduce, cg.cc:106,117).
    Preconditioned pipelined CG fuses three scalars the same way."""

    def __init__(self, axis: str, precision):
        self.axis = axis
        self.precision = precision

    def __call__(self, pairs):
        stacked = jnp.stack(
            [vdot(a, b, precision=self.precision) for a, b in pairs]
        )
        out = jax.lax.psum(stacked, self.axis)
        return tuple(out[i] for i in range(len(pairs)))

    def __hash__(self):
        return hash((type(self), self.axis, str(self.precision)))

    def __eq__(self, other):
        return type(other) is type(self) and (
            other.axis,
            str(other.precision),
        ) == (self.axis, str(self.precision))


class _TreeNeumannPrecond:
    """Distributed degree-1 Neumann apply: z = 2 D^-1 r - D^-1 A (D^-1 r).

    Reuses the strategy mat-vec (halo/allgather/...) for the inner
    A-product, so the preconditioner costs one extra mat-vec-comm per
    iteration while roughly halving the iteration count — net comm win.
    The tree is (op, inv_diag)."""

    def __init__(self, base_mv):
        self.base = base_mv

    def __call__(self, tree, r):
        op, inv_diag = tree
        c = inv_diag * r
        return 2.0 * c - inv_diag * self.base(op, c)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


class _TreeChebyPrecond:
    """Distributed degree-d Chebyshev polynomial apply: d strategy
    mat-vecs (halo/allgather comm each), zero reductions. The spectral
    bounds are baked in as compile-time constants."""

    def __init__(self, base_mv, lmin: float, lmax: float, degree: int):
        self.base = base_mv
        self.lmin = lmin
        self.lmax = lmax
        self.degree = degree

    def __call__(self, tree, r):
        from cgx.solver.precond import chebyshev_poly

        op = tree[0]
        return chebyshev_poly(
            _BoundMv(self.base, op), self.lmin, self.lmax, self.degree
        )(r)

    def _key(self):
        return (type(self), self.base, self.lmin, self.lmax, self.degree)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


class _BoundMv:
    def __init__(self, base, op):
        self.base = base
        self.op = op

    def __call__(self, v):
        return self.base(self.op, v)


class _JacobiLocal:
    """Sharded Jacobi apply: z = r / diag(A), purely local."""

    def __call__(self, inv_diag_loc, r_loc):
        return inv_diag_loc * r_loc

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------


def make_sharded_solver(
    mat,
    n: int,
    *,
    dtype=np.float64,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    method: str = "reference",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    dot_precision=None,
    jacobi: bool = False,
    precond: Optional[str] = None,
    precond_block_size: Optional[int] = None,
    bounds: Optional[tuple] = None,
    check_every: int = 32,
    sstep_s: int = 4,
    sstep_basis: str = "chebyshev",
    sstep_replace_every: Optional[int] = None,
    sstep_powers: str = "off",
    sstep_bands_dtype="auto",
    gv_replace_every: int = 25,
    dense_fp64: str = "emulated",
    local_kernel: str = "auto",
    axis_name: str = ROWS_AXIS,
) -> "ShardedCGSolver":
    """Build an OPERATOR-RESIDENT row-block-sharded CG solver.

    The matrix is device_put in its sharded layout and the shard_map
    program is jitted ONCE; the returned :class:`ShardedCGSolver`
    solves repeated right-hand sides paying only the O(N) b upload
    per call (production sequences and benchmarking both need this —
    re-entering sharded_cg_solve re-uploads the operator every call,
    which for an 80 MB band set through a remote runtime costs more
    than the solve). ``n`` is the system size and ``dtype`` the solve
    dtype (b is NOT needed at build time).

    All reference-parity semantics of :func:`sharded_cg_solve` apply;
    ``tol``/``nearzero`` given here become per-call defaults (they are
    runtime scalars, overridable per solve without recompilation).

    Args:
      mat: a host container — :class:`DIAMatrix`, :class:`ELLMatrix`,
        :class:`CSRMatrix`, :class:`COOMatrix` (converted to CSR),
        :class:`DenseMatrix` or a square ``np.ndarray``.
      b: right-hand side (host or device array, length N).
      mesh: 1-D mesh (defaults to all local devices).
      strategy: 'allgather' | 'reducescatter' | 'halo' | 'auto'
        (auto = halo for DIA, allgather for dense).
      method: 'reference' (2 psum + comm-parity recurrence),
        'pipelined' (Chronopoulos-Gear: ONE fused psum per iteration,
        length 2 — or 3 with a preconditioner), 'gvpipe'
        (Ghysels-Vanroose communication-HIDING pipelined CG: same ONE
        fused psum, but the mat-vec input never depends on it, so XLA
        overlaps the all-reduce latency with the mat-vec —
        cgx.solver.gvpipe; guarded residual replacement every
        ``gv_replace_every`` iterations), or 'chebyshev'
        (ZERO per-iteration reductions — one psum every
        ``check_every`` iterations for the convergence test; needs
        spectral ``bounds``, estimated on the host when omitted), or
        'sstep' (communication-avoiding CG: ``sstep_s`` exact CG
        iterations per ONE Gram-matrix psum, Chebyshev-basis
        stabilised — cgx.solver.sstep).
      bounds: (lmin, lmax) for method='chebyshev'/'sstep'; defaults to
        :func:`cgx.solver.chebyshev.host_spectral_bounds` on ``mat``.
      check_every: convergence-check cadence for method='chebyshev'.
      sstep_s: iterations per reduction for method='sstep'.
      sstep_basis: 'chebyshev' | 'newton' (Leja-ordered Ritz shifts)
        for the s-step basis.
      sstep_replace_every: guarded residual-replacement cadence in
        outer s-step blocks (0 = off; one extra local mat-vec per
        cadence*sstep_s iterations pins the recursive residual to the
        true one, enabling sstep_s up to ~16 at fp64). None (default)
        = off for sstep_s <= 8, cadence 1 for larger s. Not available
        with sstep_powers='fused' (the fused block has no replacement
        hook; an explicit cadence — or sstep_s > 8 — raises there).
      sstep_powers: 'off' (default) | 'deephalo' | 'fused'. With
        'deephalo' (DIA matrices, strategy 'halo'/'auto'), the s-step
        basis is built by the distributed matrix-powers scheme: ONE
        depth-(s*h) ppermute halo exchange per s-iteration block plus
        redundant edge recompute, instead of 2(2s-1) depth-h exchanges
        — 2 ppermutes + 1 psum per s iterations total. Requires s*h <=
        shard size. 'fused' keeps that collective pattern but runs the
        fused streaming s-step block per shard (cgx.ops.sstep_stream
        via cgx.parallel.sstep_fused: the Krylov basis never touches
        HBM — (2*ndiag+8)·N_loc words per s iterations vs 15·s·N_loc);
        fp32/bf16 DIA only, and the shard must tile into the kernels'
        (rows, cols) planes (fused_plane_geometry raises otherwise —
        'deephalo' is the constraint-free fallback).
      sstep_bands_dtype: storage dtype for the fused block's streamed
        band planes (sstep_powers='fused' only). 'auto' (default)
        narrows to bf16 exactly when every band value round-trips
        bf16 bit-for-bit — identical band values (the kernels widen
        on load) at half the band traffic; note the bf16 sublane tile
        may change the plane geometry, which reorders the Gram
        accumulation (trajectory equal to full-width up to rounding).
        None forces full-width planes; an explicit dtype rounds the
        operator consistently (cf. dia_sstep_stream_solve).
      dense_fp64: 'emulated' (default — bit-stable vs round 1) |
        'ozaki' | 'auto': route for dense fp64 LOCAL mat-vecs.
        'ozaki' shards the int8 Ozaki slices (cgx/ops/ozaki.py) over
        rows and runs each shard's product on the MXU's s8xs8->s32
        path — fp64 quality at 23x the emulated rate, same 1-allgather
        collective signature. 'auto' = ozaki on accelerators.
      local_kernel: 'auto' (default) | 'xla' | 'stream2d': LOCAL
        mat-vec path for the DIA halo strategy. 'stream2d' streams the
        shard through the Pallas HBM kernel — ~2x per-iteration at
        shard sizes past the XLA fusion cliff (>=2e6 fp32 unknowns per
        chip; BENCHMARKS round-2 session 8); identical collective
        signature. 'auto' picks it exactly there (accelerator +
        fp32/bf16 + big shard), XLA elsewhere.
      precond: None | 'jacobi' | 'block_jacobi' | 'neumann' |
        'chebyshev'. Jacobi is purely local; block-Jacobi (DIA/dense
        matrices) inverts the (m, m) diagonal blocks once at setup and
        applies them as one LOCAL batched MXU matmul per iteration —
        zero extra collectives, same signature as Jacobi; Neumann
        (degree-1 polynomial) adds one strategy-mat-vec per iteration
        but roughly halves the iteration count — a net comm win;
        Chebyshev (degree-3 polynomial, Lanczos/``bounds`` spectral
        estimate) adds three mat-vecs and cuts iterations further.
        ``jacobi=True`` is kept as an alias for precond='jacobi'.
      precond_block_size: rows per block for precond='block_jacobi'
        (None -> 32 capped at the shard size; must divide the shard
        size n_pad/p so blocks never straddle shards).

    N is padded to a multiple of the mesh size with zero rows/columns;
    padded entries of b/x/r/p remain exactly zero through every
    iteration, so reductions and the returned (truncated) solution are
    unaffected.
    """
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n = int(n)
    if maxiter is None:
        # Chebyshev trades constant factors for comm (cf. chebyshev_solve)
        maxiter = 4 * n if method == "chebyshev" else n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize
    dtype = jax.dtypes.canonicalize_dtype(np.dtype(dtype))

    if method == "sstep":
        # the s-step basis builders (and the deep-halo matrix-powers
        # scheme) consume the FLAT local bands; the planes layout is
        # wired for the per-iteration methods only
        local_kernel = "xla"
    # knob validation (ADVICE r4): these two are fused-path-only /
    # mutually exclusive with 'fused'; reject silently-ignored combos
    # at build time rather than dropping the promised semantics.
    if method == "sstep" and sstep_powers == "fused":
        if sstep_replace_every is not None:
            raise ValueError(
                "sstep_powers='fused' has no residual-replacement "
                "cadence (the fused block's recurrence lives inside "
                "the kernel); sstep_replace_every is only meaningful "
                "with sstep_powers='off'/'deephalo'"
            )
        if int(sstep_s) > 8:
            raise ValueError(
                "sstep_powers='fused' supports sstep_s <= 8 (larger s "
                "needs the residual-replacement cadence of "
                "sstep_powers='off'/'deephalo')"
            )
    elif not (
        sstep_bands_dtype is None
        or (isinstance(sstep_bands_dtype, str) and sstep_bands_dtype == "auto")
    ):
        raise ValueError(
            "sstep_bands_dtype is only consumed by method='sstep' with "
            f"sstep_powers='fused' (got sstep_bands_dtype="
            f"{sstep_bands_dtype!r} with method={method!r}, "
            f"sstep_powers={sstep_powers!r})"
        )
    mat, op_dev, mv, diag = _build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name,
        dense_fp64=dense_fp64, local_kernel=local_kernel,
    )

    if jacobi and precond is None:
        precond = "jacobi"
    # validate BEFORE the preconditioner block: pc construction can be
    # expensive (spectral estimation), so reject doomed combos first
    if method in ("chebyshev", "sstep") and precond is not None:
        raise ValueError(f"method={method!r} does not take a preconditioner")
    pc_fn = None
    tree = op_dev
    pc_spec = P(axis_name)
    if precond == "block_jacobi":
        # Batched block-diagonal inverses, row-sharded on the block
        # axis: the apply is one LOCAL (nb_loc, m, m) @ (nb_loc, m)
        # MXU contraction — no collectives, identical per-iteration
        # signature to 'jacobi' (pinned in test_collective_counts).
        from cgx.solver.precond import diag_blocks, invert_spd_blocks

        if not (isinstance(mat, (DIAMatrix, DenseMatrix))
                or (isinstance(mat, np.ndarray) and mat.ndim == 2)):
            raise ValueError(
                "precond='block_jacobi' needs a DIA or dense matrix"
            )
        m_bj = precond_block_size or min(32, n_loc)
        if n_loc % m_bj != 0:
            raise ValueError(
                f"precond_block_size {m_bj} must divide the shard "
                f"size {n_loc} (blocks may not straddle shards)"
            )
        inv_blocks = invert_spd_blocks(
            diag_blocks(mat, m_bj, n_rows=n_pad)
        ).astype(dtype)
        tree = (op_dev, _put(inv_blocks, mesh, P(axis_name, None, None)))
        pc_spec = P(axis_name, None, None)
        mv = _TreeMatvec(mv)
        pc_fn = _TreeBlockJacobiPrecond()
    elif precond is not None:
        inv_diag = np.zeros(n_pad, dtype=dtype)
        inv_diag[:n] = 1.0 / np.asarray(diag, dtype=dtype)
        inv_diag_dev = _put(inv_diag, mesh, P(axis_name))
        tree = (op_dev, inv_diag_dev)
        base_mv = mv
        mv = _TreeMatvec(base_mv)
        if precond == "jacobi":
            pc_fn = _TreePrecond()
        elif precond == "neumann":
            pc_fn = _TreeNeumannPrecond(base_mv)
        elif precond == "chebyshev":
            from cgx.solver.chebyshev import host_spectral_bounds

            lo, hi = bounds if bounds is not None else host_spectral_bounds(mat)
            pc_fn = _TreeChebyPrecond(base_mv, float(lo), float(hi), 3)
        else:
            raise ValueError(f"unknown precond {precond!r}")

    if method == "pipelined":
        from cgx.solver.pipelined import pipelined_cg_loop

        loop = partial(
            pipelined_cg_loop,
            maxiter=int(maxiter),
            history=int(history),
            dot_precision=dot_precision,
            matvec=mv,
            precond=pc_fn,
            dots=_PsumDots(axis_name, dot_precision),
        )
    elif method == "gvpipe":
        from cgx.solver.gvpipe import gv_cg_loop

        loop = partial(
            gv_cg_loop,
            maxiter=int(maxiter),
            history=int(history),
            dot_precision=dot_precision,
            matvec=mv,
            precond=pc_fn,
            dots=_PsumDots(axis_name, dot_precision),
            replace_every=int(gv_replace_every),
        )
    elif method == "reference":
        loop = partial(
            cg_loop,
            maxiter=int(maxiter),
            history=int(history),
            dot_precision=dot_precision,
            matvec=mv,
            precond=pc_fn,
            dot=_PsumDot(axis_name, dot_precision),
        )
    elif method == "chebyshev":
        from cgx.solver.chebyshev import host_spectral_bounds

        if bounds is None:
            bounds = host_spectral_bounds(mat)
        lmin, lmax = (float(bounds[0]), float(bounds[1]))
        if not (0 < lmin < lmax):
            raise ValueError(f"invalid spectral bounds {bounds}")
        loop = _ChebyLoop(
            lmin,
            lmax,
            mv,
            int(maxiter),
            int(check_every),
            _PsumDot(axis_name, dot_precision),
        )
    elif method == "sstep":
        from cgx.solver.chebyshev import host_spectral_bounds

        if bounds is None:
            bounds = host_spectral_bounds(mat)
        lmin, lmax = (float(bounds[0]), float(bounds[1]))
        if not (0 < lmin < lmax):
            raise ValueError(f"invalid spectral bounds {bounds}")
        if sstep_basis == "newton":
            from cgx.solver.sstep import newton_shifts

            shifts = newton_shifts(mat, n, int(sstep_s), (lmin, lmax))
        elif sstep_basis == "chebyshev":
            shifts = ()
        else:
            raise ValueError(f"unknown s-step basis {sstep_basis!r}")
        basis = None
        if sstep_powers == "fused":
            # fused streaming s-step block per shard (the basis never
            # touches HBM) under the deep-halo collective pattern —
            # see cgx.parallel.sstep_fused
            from cgx.parallel.sstep_fused import (
                _SStepFusedLoop,
                fused_plane_geometry,
            )

            if not isinstance(mat, DIAMatrix) or not isinstance(
                mv, _DiaHalo
            ):
                raise ValueError(
                    "sstep_powers='fused' needs a DIA matrix with "
                    "the 'halo' (or 'auto') strategy"
                )
            interpret = jax.default_backend() == "cpu"
            if dtype == jnp.float64 and not interpret:
                raise ValueError(
                    "sstep_powers='fused' has no fp64 TPU lowering; "
                    "use 'deephalo' or 'off' for fp64"
                )
            # sstep_bands_dtype 'auto' resolution, host-side: narrow
            # the streamed band planes to bf16 exactly when every band
            # value round-trips bf16 bit-for-bit at the solve dtype
            # (cf. dia_sstep_stream_solve) — the kernels widen
            # per-band on load, so the recurrence is bitwise unchanged
            if isinstance(sstep_bands_dtype, str) and (
                sstep_bands_dtype == "auto"
            ):
                bands_host = np.asarray(mat.bands).astype(dtype)
                bexact = bool(
                    np.all(
                        bands_host.astype(jnp.bfloat16).astype(dtype)
                        == bands_host
                    )
                )
                bdt = jnp.dtype(jnp.bfloat16) if bexact else None
            elif sstep_bands_dtype is None:
                bdt = None
            else:
                bdt = jnp.dtype(sstep_bands_dtype)
            bdt_name = None if bdt is None else bdt.name
            rows_f, cols_f, pm_f = fused_plane_geometry(
                tuple(mat.offsets), int(sstep_s), n_loc, dtype, bdt,
            )
            loop = _SStepFusedLoop(
                axis_name, tuple(mat.offsets), n_loc, psize,
                int(sstep_s), int(maxiter),
                (lmax + lmin) / 2.0, (lmax - lmin) / 2.0, shifts,
                rows_f, cols_f, pm_f, bdt_name, interpret,
            )
        elif sstep_powers == "deephalo":
            if not isinstance(mat, DIAMatrix) or not isinstance(
                mv, _DiaHalo
            ):
                raise ValueError(
                    "sstep_powers='deephalo' needs a DIA matrix with "
                    "the 'halo' (or 'auto') strategy"
                )
            basis = _DeepHaloBasis(
                axis_name, tuple(mat.offsets), n_loc, psize,
                int(sstep_s), (lmax + lmin) / 2.0, (lmax - lmin) / 2.0,
                shifts,
            )
        elif sstep_powers != "off":
            raise ValueError(f"unknown sstep_powers {sstep_powers!r}")
        if sstep_powers != "fused":
            loop = _SStepLoop(
                (lmax + lmin) / 2.0,
                (lmax - lmin) / 2.0,
                mv,
                int(sstep_s),
                int(maxiter),
                _PsumGram(axis_name),
                shifts=shifts,
                replace_every=int(
                    (1 if int(sstep_s) > 8 else 0)
                    if sstep_replace_every is None
                    else sstep_replace_every
                ),
                basis=basis,
            )
    else:
        raise ValueError(f"unknown method {method!r}")

    op_spec = _op_spec(mat, axis_name, mv)
    tree_spec = (op_spec, pc_spec) if precond is not None else op_spec
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(
                tree_spec,
                P(axis_name),
                P(axis_name),
                P(),
                P(),
            ),
            out_specs=CGResult(
                x=P(axis_name),
                iterations=P(),
                residual_norm=P(),
                converged=P(),
                rsold=P(),
                history=P(),
                breakdown=P(),
            ),
            check_vma=False,
        )
    )
    scalar_dtype = dtype if dot_precision is None else jnp.dtype(dot_precision)
    return ShardedCGSolver(
        fn, tree, mesh, axis_name, n, n_pad, dtype, scalar_dtype,
        float(tol), float(nearzero),
    )


class ShardedCGSolver:
    """Operator-resident sharded CG solver (see make_sharded_solver).

    Calling it solves ``A x = b`` for a new right-hand side without
    re-uploading the operator or re-tracing the program; ``x0`` warm
    starts, and ``tol``/``nearzero`` override the build-time defaults
    per call (runtime scalars — no recompilation)."""

    def __init__(self, fn, tree, mesh, axis_name, n, n_pad, dtype,
                 scalar_dtype, tol, nearzero):
        self._fn = fn
        self._tree = tree
        self._mesh = mesh
        self._axis_name = axis_name
        self.n = n
        self._n_pad = n_pad
        self.dtype = dtype
        self._scalar_dtype = scalar_dtype
        self._tol = tol
        self._nearzero = nearzero

    def solve(
        self,
        b,
        x0=None,
        *,
        tol: Optional[float] = None,
        nearzero: Optional[float] = None,
    ) -> CGResult:
        n, n_pad = self.n, self._n_pad
        b = np.asarray(b, self.dtype)
        if b.shape != (n,):
            raise ValueError(f"b must be ({n},); got {b.shape}")
        b_dev = _put(
            pad_vector(b, n_pad), self._mesh, P(self._axis_name)
        )
        if x0 is None:
            x0 = jnp.zeros_like(b_dev)
        else:
            # warm start (e.g. the previous step of a time-stepping
            # sequence): validated, cast to the solve dtype (a float64
            # x0 must not silently promote an fp32 carry), padded and
            # sharded like b
            x0 = np.asarray(x0, self.dtype)
            if x0.shape != (n,):
                raise ValueError(f"x0 must be ({n},); got {x0.shape}")
            x0 = _put(
                pad_vector(x0, n_pad), self._mesh, P(self._axis_name)
            )
        res = run_recorded(
            self._fn,
            self._tree,
            b_dev,
            x0,
            jnp.asarray(
                self._tol if tol is None else tol, self._scalar_dtype
            ),
            jnp.asarray(
                self._nearzero if nearzero is None else nearzero,
                self.dtype,
            ),
        )
        # Truncate padding off the solution.
        return res._replace(x=res.x[:n])

    __call__ = solve


def sharded_cg_solve(mat, b, *, x0=None, sstep_fallback: str = "auto",
                     **kwargs) -> CGResult:
    """Solve ``A x = b`` with row-block-sharded CG over a device mesh
    (one-shot convenience over :func:`make_sharded_solver` — see its
    docstring for every option; repeated solves against the SAME
    operator should build the solver once instead of re-uploading the
    matrix per call).

    ``sstep_fallback``: 'auto' (default), 'adaptive', or 'off'.
    s-step's Krylov block basis can lose numerical rank on smooth
    right-hand sides (measured at the flagship size, BENCHMARKS round
    4) — the replay then freezes at the last valid iterate with
    ``breakdown=True``. With 'auto' a ``method='sstep'`` solve that
    broke down unconverged is finished by the reference recurrence
    (one all-reduce pair per iteration), warm-started from the frozen
    iterate via the exact shift identity — mirroring the
    single-device :func:`cgx.solver.sstep.sstep_cg_solve` fallback.
    'adaptive' (r4 VERDICT item 8) first walks the s-LADDER: restart
    the sharded s-step at sstep_s//2 (recursively down to s=2 —
    keeping the one-Gram-psum-per-s collective economics), and only
    drop to the reference recurrence when s=2 also collapses.
    Genuine breakdowns (indefinite operator) still surface from the
    fallback itself."""
    if sstep_fallback not in ("auto", "adaptive", "off"):
        raise ValueError(f"unknown sstep_fallback {sstep_fallback!r}")
    b = np.asarray(b)
    solver = make_sharded_solver(
        mat, b.shape[0],
        dtype=jax.dtypes.canonicalize_dtype(
            b.dtype if np.issubdtype(b.dtype, np.floating) else np.float64
        ),
        **kwargs,
    )
    res = solver.solve(b, x0=x0)
    if (
        sstep_fallback in ("auto", "adaptive")
        and kwargs.get("method") == "sstep"
        and bool(res.breakdown)
        and not bool(res.converged)
    ):
        used = int(res.iterations)
        left = int(kwargs.get("maxiter") or b.shape[0]) - used
        if left > 0:
            s_cur = int(kwargs.get("sstep_s", 4))
            if sstep_fallback == "adaptive" and s_cur >= 4:
                kw2 = dict(kwargs)
                kw2["sstep_s"] = s_cur // 2
                kw2["maxiter"] = left
                res2 = sharded_cg_solve(
                    mat, b, x0=np.asarray(res.x),
                    sstep_fallback="adaptive", **kw2,
                )
            else:
                kw2 = {
                    k: v for k, v in kwargs.items()
                    if not k.startswith("sstep_")
                }
                kw2["method"] = "reference"
                kw2["maxiter"] = left
                res2 = sharded_cg_solve(
                    mat, b, x0=np.asarray(res.x), sstep_fallback="off",
                    **kw2,
                )
            return res2._replace(iterations=res2.iterations + used)
    return res



# Per-shard size (in fp32-equivalent elements) above which the XLA
# fused loop falls off the HBM cliff and the Pallas streaming kernel
# takes over the LOCAL banded mat-vec (measured: BENCHMARKS round-2
# session 8 — XLA 25-30% vs stream 49-52% of roofline at N>=4e6).
STREAM_LOCAL_MIN_ELEMS = 2_000_000


def _resolve_local_kernel(local_kernel: str, n_loc: int, dtype) -> str:
    if local_kernel != "auto":
        return local_kernel
    if jax.default_backend() == "cpu":
        return "xla"  # interpret-mode Pallas would only slow CPU runs
    if np.dtype(dtype).itemsize > 4:
        return "xla"  # Mosaic has no fp64
    return "stream2d" if n_loc >= STREAM_LOCAL_MIN_ELEMS else "xla"


def _build_op(
    mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name,
    dense_fp64: str = "emulated",
    local_kernel: str = "xla",
):
    """Device-put the operator in its format's sharded layout and pick
    the strategy mat-vec. Returns (mat', op_dev, mv, diag) where mat'
    is the (possibly COO->CSR-converted) host container.

    ``dense_fp64``: 'emulated' | 'ozaki' | 'auto' — route for dense
    fp64 local mat-vecs (see SolveConfig.dense_fp64); 'auto' picks
    ozaki on accelerators.

    ``local_kernel``: 'auto' | 'xla' | 'stream2d' — LOCAL mat-vec path
    for the DIA halo strategy (see :class:`_DiaHalo`); 'auto' = the
    Pallas streaming kernel on accelerators for fp32/bf16 shards above
    the measured XLA bandwidth cliff, XLA otherwise."""
    if isinstance(mat, DIAMatrix):
        bands = pad_bands(np.asarray(mat.bands, dtype=dtype), n_pad)
        op_dev = _put(bands, mesh, P(None, axis_name))
        offsets = tuple(mat.offsets)
        halo = max(max(abs(o) for o in offsets), 1)
        if strategy == "auto":
            # halo exchange when the bandwidth fits in a shard,
            # all-gather otherwise (tiny shards / wide stencils)
            strategy = "halo" if halo <= n_loc else "allgather"
        if strategy == "halo":
            lk = _resolve_local_kernel(local_kernel, n_loc, dtype)
            rows2d, cols2d = 256, 512
            if lk == "stream2d":
                # pre-padded per-shard band planes: build ONCE here —
                # XLA will not hoist a per-iteration re-pad out of the
                # while loop (scripts/bw_control3.py: 128-158 GB/s
                # apparent with the re-pad vs the 7-word kernel model)
                from cgx.ops.dia_spmv import stream2d_band_planes

                per_shard = [
                    stream2d_band_planes(
                        bands[:, s * n_loc : (s + 1) * n_loc],
                        rows=rows2d, cols=cols2d,
                    )
                    for s in range(psize)
                ]
                planes = np.concatenate(per_shard, axis=1)
                op_dev = _put(planes, mesh, P(None, axis_name, None))
            mv = _DiaHalo(
                axis_name, offsets, n_loc, psize,
                local_kernel=lk, rows=rows2d, cols=cols2d,
            )
        elif strategy == "allgather":
            mv = _DiaAllGather(axis_name, offsets, n_loc)
        else:
            raise ValueError(f"strategy {strategy!r} not supported for DIA matrices")
        diag = mat.bands[mat.offsets.index(0)]
    elif isinstance(mat, (CSRMatrix, COOMatrix)):
        if isinstance(mat, COOMatrix):
            mat = CSRMatrix.from_coo(mat)
        if strategy not in ("auto", "allgather"):
            raise ValueError(f"strategy {strategy!r} not supported for CSR matrices")
        lengths = np.diff(mat.indptr)
        row_of = np.repeat(np.arange(n, dtype=np.int64), lengths)
        shard_of = row_of // n_loc
        nnz_per_shard = np.bincount(shard_of, minlength=psize)
        max_nnz = max(int(nnz_per_shard.max()), 1)
        vals_p = np.zeros((psize, max_nnz), dtype=dtype)
        idx_p = np.zeros((psize, max_nnz), dtype=np.int32)
        rid_p = np.zeros((psize, max_nnz), dtype=np.int32)
        for s in range(psize):
            sel = shard_of == s
            cnt = int(nnz_per_shard[s])
            vals_p[s, :cnt] = mat.values[sel]
            idx_p[s, :cnt] = mat.indices[sel]
            rid_p[s, :cnt] = row_of[sel] - s * n_loc
        op_dev = (
            _put(vals_p.reshape(-1), mesh, P(axis_name)),
            _put(idx_p.reshape(-1), mesh, P(axis_name)),
            _put(rid_p.reshape(-1), mesh, P(axis_name)),
        )
        mv = _CsrAllGather(axis_name, n_loc)
        on_diag = mat.indices == row_of
        diag = np.zeros(n, dtype=np.float64)
        np.add.at(diag, row_of[on_diag], mat.values[on_diag])
    elif isinstance(mat, ELLMatrix):
        if strategy not in ("auto", "allgather"):
            raise ValueError(
                f"strategy {strategy!r} not supported for ELLPACK matrices"
            )
        k = mat.values.shape[1]
        vals = np.zeros((n_pad, k), dtype=dtype)
        vals[:n] = mat.values
        idx = np.zeros((n_pad, k), dtype=np.int32)
        idx[:n] = mat.indices
        op_dev = (
            _put(vals, mesh, P(axis_name, None)),
            _put(idx, mesh, P(axis_name, None)),
        )
        mv = _EllAllGather(axis_name)
        on_diag = mat.indices == np.arange(n, dtype=mat.indices.dtype)[:, None]
        diag = np.where(on_diag, mat.values, 0.0).sum(axis=1)
    else:
        a = mat.a if isinstance(mat, DenseMatrix) else np.asarray(mat)
        if a.shape[0] != a.shape[1]:
            raise ValueError("matrix must be square")
        use_ozaki = np.dtype(dtype) == np.float64 and (
            dense_fp64 == "ozaki"
            or (dense_fp64 == "auto" and jax.default_backend() != "cpu")
        )
        if use_ozaki:
            if strategy not in ("auto", "allgather"):
                raise ValueError(
                    "dense_fp64='ozaki' supports the allgather strategy"
                )
            from cgx.ops.ozaki import build_slices_np

            c, sigma = build_slices_np(pad_dense(a, n_pad))
            op_dev = (
                _put(c, mesh, P(None, axis_name, None)),
                _put(sigma, mesh, P(axis_name)),
            )
            mv = _DenseOzakiAllGather(axis_name)
        else:
            a_pad = pad_dense(a.astype(dtype), n_pad)
            op_dev = _put(a_pad, mesh, P(axis_name, None))
            if strategy in ("auto", "allgather"):
                mv = _DenseAllGather(axis_name)
            elif strategy == "reducescatter":
                mv = _DenseReduceScatter(axis_name)
            else:
                raise ValueError(
                    f"strategy {strategy!r} not supported for dense matrices"
                )
        diag = np.diagonal(a)
    return mat, op_dev, mv, diag


class _PsumGram:
    """V V^T (V is the (m, n) basis stack) with local MXU contraction
    + ONE psum of the (m, m) block — the s-step method's single
    reduction per s iterations."""

    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, v):
        g = jnp.einsum("mn,kn->mk", v, v, precision=jax.lax.Precision.HIGHEST)
        return jax.lax.psum(g, self.axis)

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


class _SStepLoop:
    """Adapter giving ``sstep_cg_loop`` the (tree, b, x0, tol, nearzero)
    signature the shard_map below expects; basis interval, Newton
    shifts, and the residual-replacement cadence baked in."""

    def __init__(self, theta, delta, mv, s, maxiter, gram,
                 shifts=(), replace_every=0, basis=None):
        self.theta = theta
        self.delta = delta
        self.mv = mv
        self.s = s
        self.maxiter = maxiter
        self.gram = gram
        self.shifts = tuple(shifts)
        self.replace_every = replace_every
        self.basis = basis  # optional _DeepHaloBasis

    def __call__(self, tree, b, x0, tol, nearzero):
        from cgx.solver.sstep import sstep_cg_loop

        matvec = self.mv
        if self.basis is not None:
            # band halos are loop-invariant: exchange once, outside the
            # while loop, and thread (bands, bands_ext) as the tree
            tree = (tree, self.basis.extend_bands(tree))
            matvec = _TreeFirstMV(self.mv)
        return sstep_cg_loop(
            tree,
            b,
            x0,
            tol,
            nearzero,
            matvec=matvec,
            s=self.s,
            maxiter=self.maxiter,
            theta=self.theta,
            delta=self.delta,
            gram=self.gram,
            shifts=self.shifts,
            basis_fn=self.basis,
            replace_every=self.replace_every,
        )

    def _key(self):
        return (
            type(self), self.theta, self.delta, self.mv, self.s,
            self.maxiter, self.gram, self.shifts, self.replace_every,
            self.basis,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


class _TreeFirstMV:
    """Strategy mat-vec adapter for the (bands, bands_ext) tree the
    deep-halo s-step path threads through sstep_cg_loop."""

    def __init__(self, mv):
        self.mv = mv

    def __call__(self, tree, v):
        return self.mv(tree[0], v)

    def __hash__(self):
        return hash((type(self), self.mv))

    def __eq__(self, other):
        return type(other) is type(self) and other.mv == self.mv


class _RefineLoop:
    """Sharded mixed-precision refinement program (per shard, inside
    shard_map): ``sweeps`` rounds of [fp32 inner (P)CG on the
    normalized fp64 residual -> fp64 correction + true-residual
    recompute], with on-device early exit once ||r||_64 < tol. The
    fp32 inner runs the same strategy mat-vec/psum machinery as
    sharded_cg_solve; fp64 appears only in the outer mat-vec, the
    residual update, and one psum per sweep."""

    def __init__(self, mv64, mv32, sweeps, inner_tol, inner_maxiter,
                 dot64, dot32):
        self.mv64 = mv64
        self.mv32 = mv32
        self.sweeps = sweeps
        self.inner_tol = inner_tol
        self.inner_maxiter = inner_maxiter
        self.dot64 = dot64
        self.dot32 = dot32

    def __call__(self, tree, b64, x0, rtol, nearzero):
        bands64, bands32 = tree
        # RELATIVE target: refinement recomputes the TRUE residual
        # b - A x each sweep, which bottoms out at ~eps*||A||*||x|| —
        # an absolute target below that floor is unreachable no matter
        # how many sweeps run (the recursive residual of plain CG can
        # drift below it; the true residual cannot).
        tol = rtol * jnp.sqrt(self.dot64(b64, b64))
        r0 = b64 - self.mv64(bands64, x0)
        rr0 = self.dot64(r0, r0)
        counts0 = jnp.zeros((self.sweeps,), jnp.int32)

        def cond(state):
            s, x, r, rr, counts = state
            return jnp.logical_and(s < self.sweeps, jnp.sqrt(rr) >= tol)

        def body(state):
            s, x, r, rr, counts = state
            # normalize so fp32 dynamic range is centred for any ||b||
            scale = jnp.sqrt(jnp.maximum(rr, jnp.finfo(b64.dtype).tiny))
            r32 = (r / scale).astype(jnp.float32)
            inner = cg_loop(
                bands32,
                r32,
                jnp.zeros_like(r32),
                jnp.asarray(self.inner_tol, jnp.float32),
                nearzero.astype(jnp.float32),
                maxiter=self.inner_maxiter,
                history=0,
                dot_precision=None,
                matvec=self.mv32,
                precond=None,
                dot=self.dot32,
            )
            x = x + inner.x.astype(b64.dtype) * scale
            r = b64 - self.mv64(bands64, x)
            rr = self.dot64(r, r)
            counts = counts.at[s].set(inner.iterations)
            return (s + 1, x, r, rr, counts)

        # genuine early exit: a converged solve runs ZERO further inner
        # CGs (cf. the single-device _refine_sweeps_jit while_loop)
        s, x, r, rr, counts = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32), x0, r0, rr0, counts0)
        )
        res = jnp.sqrt(rr)
        return CGResult(
            x=x,
            # iterations = OUTER sweeps used (matches the single-device
            # refine path's outer_iterations); per-sweep inner counts
            # ride in history
            iterations=s,
            residual_norm=res,
            converged=res < tol,
            rsold=rr,
            history=counts.astype(b64.dtype),
            breakdown=jnp.asarray(False),
        )

    def _key(self):
        return (
            type(self), self.mv64, self.mv32, self.sweeps, self.inner_tol,
            self.inner_maxiter, self.dot64, self.dot32,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


def sharded_refine_fixed_sweeps(
    mat: DIAMatrix,
    b: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    sweeps: int = 4,
    rtol: float = 1e-11,
    inner_tol: float = 1e-6,
    inner_maxiter: Optional[int] = None,
    axis_name: str = ROWS_AXIS,
) -> CGResult:
    """Sharded mixed-precision solve: fp32 inner sharded CG + fp64
    outer refinement sweeps, ONE shard_map program (the multi-chip
    analogue of :func:`cgx.solver.refine.refine_fixed_sweeps`, with
    the same RELATIVE tolerance semantics: converged means
    ``||b - A x|| < rtol * ||b||`` — the true residual cannot drop
    below the fp64 floor, unlike plain CG's recursive residual).

    fp64 on TPU is emulated (~10x slower per op); this runs the O(n)
    iteration work and all per-iteration psums in fp32 and pays fp64
    only for one mat-vec + one psum per SWEEP. Requires x64 enabled
    for the fp64 outer. Returns a CGResult whose ``iterations`` is the
    number of OUTER sweeps used (matching refine_fixed_sweeps'
    outer_iterations) and whose ``history`` holds per-sweep inner
    iteration counts."""
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n = b.shape[0]
    if inner_maxiter is None:
        inner_maxiter = n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize
    if not isinstance(mat, DIAMatrix):
        raise TypeError("sharded_refine_fixed_sweeps needs a DIAMatrix")

    b64 = pad_vector(np.asarray(b, np.float64), n_pad)
    b_dev = _put(b64, mesh, P(axis_name))
    bands64 = pad_bands(np.asarray(mat.bands, np.float64), n_pad)
    bands32 = bands64.astype(np.float32)
    offsets = tuple(mat.offsets)
    halo = max(max(abs(o) for o in offsets), 1)
    if strategy == "auto":
        strategy = "halo" if halo <= n_loc else "allgather"
    if strategy == "halo":
        mv64 = _DiaHalo(axis_name, offsets, n_loc, psize)
        # the fp32 INNER loop (where all the iterations happen) may
        # stream through Pallas; the fp64 outer mat-vec stays on XLA
        lk32 = _resolve_local_kernel("auto", n_loc, np.float32)
        mv32 = _DiaHalo(
            axis_name, offsets, n_loc, psize, local_kernel=lk32,
        )
    elif strategy == "allgather":
        mv64 = _DiaAllGather(axis_name, offsets, n_loc)
        mv32 = mv64  # same class; dtype rides the operands
        lk32 = "xla"
    else:
        raise ValueError(f"strategy {strategy!r} not supported here")

    if lk32 == "stream2d":
        # fp32 inner operand: pre-padded per-shard band planes (the
        # per-iteration re-pad is not hoistable; see _build_op)
        from cgx.ops.dia_spmv import stream2d_band_planes

        bands32 = np.concatenate(
            [
                stream2d_band_planes(
                    bands32[:, s * n_loc : (s + 1) * n_loc],
                    rows=mv32.rows, cols=mv32.cols,
                )
                for s in range(psize)
            ],
            axis=1,
        )
        spec32 = P(None, axis_name, None)
    else:
        spec32 = P(None, axis_name)

    loop = _RefineLoop(
        mv64,
        mv32,
        int(sweeps),
        float(inner_tol),
        int(inner_maxiter),
        _PsumDot(axis_name, None),
        _PsumDot(axis_name, None),
    )
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(
                (P(None, axis_name), spec32),
                P(axis_name),
                P(axis_name),
                P(),
                P(),
            ),
            out_specs=CGResult(
                x=P(axis_name),
                iterations=P(),
                residual_norm=P(),
                converged=P(),
                rsold=P(),
                history=P(),
                breakdown=P(),
            ),
            check_vma=False,
        )
    )
    res = run_recorded(fn,
        (
            _put(bands64, mesh, P(None, axis_name)),
            _put(bands32, mesh, spec32),
        ),
        b_dev,
        jnp.zeros(n_pad, jnp.float64).reshape(-1),
        jnp.asarray(rtol, jnp.float64),
        jnp.asarray(NEARZERO, jnp.float64),
    )
    return res._replace(x=res.x[:n])


class _PsumTallT:
    """(j,) tall contraction M^T v: local einsum + one psum — the
    deflated loop's fused [W, AW]^T r reduction over the mesh."""

    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, m_, v):
        c = jnp.einsum(
            "nk,n->k", m_, v, precision=jax.lax.Precision.HIGHEST
        )
        return jax.lax.psum(c, self.axis)

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


def sharded_cg_solve_harvest(
    mat,
    b: np.ndarray,
    *,
    k: int = 8,
    window: Optional[int] = None,
    ritz_tol: float = 1e-3,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    strict: bool = True,
    local_kernel: str = "auto",
    axis_name: str = ROWS_AXIS,
) -> Tuple[CGResult, Optional[np.ndarray]]:
    """Row-block-sharded plain CG that ALSO harvests a deflation basis
    from its own iterates (the sharded :func:`cgx.cg_solve_harvest`):
    returns ``(result, w)`` where ``w`` is an (n, k') orthonormal host
    matrix of converged Ritz vectors, ready for
    :func:`sharded_deflated_cg_solve`'s ``w=`` (or a single-device
    :class:`DeflationBasis`). The window rides the mesh row-sharded
    ((window, n_loc) per shard — same memory per device as ``window``
    extra carried vectors); the recurrence scalars are replicated.
    Zero extra mat-vecs and zero extra collectives vs the plain solve
    (the capture is local); the CG<->Lanczos tridiagonal is built on
    the host afterwards."""
    from cgx.solver.deflated import _harvest_cg_loop, _ritz_from_cg_window

    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if window is None:
        window = max(8 * k, 64)
    window = int(min(window, maxiter, n))
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize

    b_dev = _put(pad_vector(np.asarray(b), n_pad), mesh, P(axis_name))
    dtype = b_dev.dtype
    mat, op_dev, mv, _diag = _build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name,
        local_kernel=local_kernel,
    )
    op_spec = _op_spec(mat, axis_name, mv)

    loop = partial(
        _harvest_cg_loop,
        matvec=mv,
        maxiter=int(maxiter),
        window=window,
        dot=_PsumDot(axis_name, None),
    )
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(op_spec, P(axis_name), P(axis_name), P(), P()),
            out_specs=(
                CGResult(
                    x=P(axis_name),
                    iterations=P(),
                    residual_norm=P(),
                    converged=P(),
                    rsold=P(),
                    history=P(),
                    breakdown=P(),
                ),
                P(None, axis_name),  # window: rows x sharded columns
                P(),
                P(),
            ),
            check_vma=False,
        )
    )
    res, win, av, bv = run_recorded(
        fn,
        op_dev,
        b_dev,
        jnp.zeros_like(b_dev),
        jnp.asarray(tol, dtype),
        jnp.asarray(nearzero, dtype),
    )
    steps = min(int(res.iterations) + 1, window)
    res = res._replace(x=res.x[:n])
    if jax.process_count() > 1:
        # the window spans non-addressable devices on a multi-host
        # mesh: gather it to every host (the Ritz extraction then runs
        # identically on each process — same inputs, same basis)
        from jax.experimental import multihost_utils

        win_np = np.asarray(multihost_utils.process_allgather(win, tiled=True))
    else:
        win_np = np.asarray(win)
    try:
        w = _ritz_from_cg_window(
            win_np[:, :n], np.asarray(av), np.asarray(bv),
            steps, int(k), ritz_tol,
        )
    except ValueError:
        # strict=False: never discard the completed solve
        if strict:
            raise
        return res, None
    return res, w


def sharded_deflated_cg_solve(
    mat,
    b: np.ndarray,
    *,
    k: int = 8,
    w: Optional[np.ndarray] = None,
    lanczos_m: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    precond: Optional[str] = None,
    x0: Optional[np.ndarray] = None,
    local_kernel: str = "auto",
    axis_name: str = ROWS_AXIS,
) -> CGResult:
    """Row-block-sharded DEFLATED CG (cgx.solver.deflated semantics):
    the deflation basis W rides the mesh row-sharded, the (k, k)
    Gram inverse replicated, and each iteration pays CG's two scalar
    psums plus ONE fused (2k,)-vector psum (the [W, AW]^T r
    contraction shared by the drift guard and the projector).

    The basis is harvested host-side (``lanczos_ritz`` over the host
    mat-vec — once per operator, amortised across the solve sequence)
    unless an explicit (n, k) ``w`` is given.

    ``precond``: None | 'jacobi' | 'neumann' — deflated PCG (the two
    accelerations compose). The projector's extra (AW)^T z contraction
    rides the SAME final all-reduce launch as the rsnew/rr dots (XLA
    combiner; pinned in tests/test_collective_counts.py), so deflated
    PCG pays the same three psum launches per iteration as plain
    deflated CG.
    """
    from cgx.solver.chebyshev import host_matvec
    from cgx.solver.deflated import deflated_cg_loop, lanczos_ritz

    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize

    b_dev = _put(pad_vector(np.asarray(b), n_pad), mesh, P(axis_name))
    dtype = b_dev.dtype

    if w is None:
        w = lanczos_ritz(mat, n, int(k), m=lanczos_m)
    w = np.asarray(w, np.float64)
    if w.ndim != 2 or w.shape[0] != n:
        raise ValueError(f"w must be (n, k); got {w.shape}")
    hmv = host_matvec(mat)
    aw = np.stack([hmv(w[:, j]) for j in range(w.shape[1])], axis=1)
    m_small = w.T @ aw
    minv = np.linalg.inv(m_small)
    awtaw = aw.T @ aw

    w_pad = np.zeros((n_pad, w.shape[1]))
    w_pad[:n] = w
    aw_pad = np.zeros((n_pad, w.shape[1]))
    aw_pad[:n] = aw

    mat, op_dev, mv, diag = _build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name,
        local_kernel=local_kernel,
    )
    op_spec = _op_spec(mat, axis_name, mv)

    # optional deflated PCG (deflated.py precond path): same tree
    # wrapping as sharded_cg_solve's preconditioner block
    tree = op_dev
    tree_spec = op_spec
    pc_fn = None
    if precond is not None:
        inv_diag = np.zeros(n_pad, dtype=dtype)
        inv_diag[:n] = 1.0 / np.asarray(diag, dtype=dtype)
        tree = (op_dev, _put(inv_diag, mesh, P(axis_name)))
        tree_spec = (op_spec, P(axis_name))
        base_mv = mv
        mv = _TreeMatvec(base_mv)
        if precond == "jacobi":
            pc_fn = _TreePrecond()
        elif precond == "neumann":
            pc_fn = _TreeNeumannPrecond(base_mv)
        else:
            raise ValueError(f"unknown precond {precond!r}")

    loop = partial(
        deflated_cg_loop,
        matvec=mv,
        maxiter=int(maxiter),
        dot=_PsumDot(axis_name, None),
        tallT=_PsumTallT(axis_name),
        precond=pc_fn,
    )
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(
                tree_spec,
                P(axis_name),
                P(axis_name),
                P(axis_name, None),
                P(axis_name, None),
                P(),
                P(),
                P(),
                P(),
            ),
            out_specs=CGResult(
                x=P(axis_name),
                iterations=P(),
                residual_norm=P(),
                converged=P(),
                rsold=P(),
                history=P(),
                breakdown=P(),
            ),
            check_vma=False,
        )
    )
    if x0 is None:
        x0_dev = jnp.zeros_like(b_dev)
    else:
        x0 = np.asarray(x0, dtype)
        if x0.shape != (n,):
            raise ValueError(f"x0 must be ({n},); got {x0.shape}")
        x0_dev = _put(pad_vector(x0, n_pad), mesh, P(axis_name))
    res = run_recorded(fn,
        tree,
        b_dev,
        x0_dev,
        _put(w_pad.astype(dtype), mesh, P(axis_name, None)),
        _put(aw_pad.astype(dtype), mesh, P(axis_name, None)),
        _put(minv.astype(dtype), mesh, P()),
        _put(awtaw.astype(dtype), mesh, P()),
        jnp.asarray(tol, dtype),
        jnp.asarray(nearzero, dtype),
    )
    return res._replace(x=res.x[:n])


def sharded_block_deflated_cg_solve(
    mat,
    b_block: np.ndarray,
    *,
    k: int = 8,
    w: Optional[np.ndarray] = None,
    lanczos_m: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    rank_tol: float = 1e-12,
    axis_name: str = ROWS_AXIS,
):
    """Row-sharded DEFLATED breakdown-free block CG: one shared
    Krylov block for all RHS columns plus converged-Ritz recycling,
    over the mesh. Per iteration: one block halo/all-gather mat-vec +
    three psums (the fused (3s,3s) Gram, the fused (2k,s) [W,AW]^T R
    guard/projector contraction, and the direction Gram)."""
    from cgx.solver.blockcg import (
        BlockCGResult,
        bf_block_deflated_cg_loop,
    )
    from cgx.solver.chebyshev import host_matvec
    from cgx.solver.deflated import lanczos_ritz

    if b_block.ndim != 2:
        raise ValueError("b_block must be (n, s)")
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n, s = b_block.shape
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize

    b_np = np.asarray(b_block)
    b_pad = np.zeros((n_pad, s), dtype=b_np.dtype)
    b_pad[:n] = b_np
    b_dev = _put(b_pad, mesh, P(axis_name, None))
    dtype = b_dev.dtype

    if w is None:
        w = lanczos_ritz(mat, n, int(k), m=lanczos_m)
    w = np.asarray(w, np.float64)
    if w.ndim != 2 or w.shape[0] != n:
        raise ValueError(f"w must be (n, k); got {w.shape}")
    hmv = host_matvec(mat)
    aw = np.stack([hmv(w[:, j]) for j in range(w.shape[1])], axis=1)
    minv = np.linalg.inv(w.T @ aw)
    awtaw = aw.T @ aw
    w_pad = np.zeros((n_pad, w.shape[1]))
    w_pad[:n] = w
    aw_pad = np.zeros((n_pad, w.shape[1]))
    aw_pad[:n] = aw

    mat, op_dev, mv, _diag = _build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name
    )
    if isinstance(mv, (_CsrAllGather, _EllAllGather, _DenseReduceScatter)):
        raise ValueError(
            "sharded block CG supports DIA (halo/allgather) and dense "
            "(allgather) operators"
        )
    op_spec = _op_spec(mat, axis_name, mv)

    loop = partial(
        bf_block_deflated_cg_loop,
        matvec=mv,
        maxiter=int(maxiter),
        rank_tol=float(rank_tol),
        gram=_PsumBlockGram(axis_name),
    )
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(
                op_spec,
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(axis_name, None),
                P(),
                P(),
                P(),
            ),
            out_specs=BlockCGResult(
                x=P(axis_name, None),
                iterations=P(),
                residual_norms=P(),
                converged=P(),
                breakdown=P(),
            ),
            check_vma=False,
        )
    )
    res = run_recorded(fn, 
        op_dev,
        b_dev,
        jnp.zeros_like(b_dev),
        _put(w_pad.astype(dtype), mesh, P(axis_name, None)),
        _put(aw_pad.astype(dtype), mesh, P(axis_name, None)),
        _put(minv.astype(dtype), mesh, P()),
        _put(awtaw.astype(dtype), mesh, P()),
        jnp.asarray(tol, dtype),
    )
    return res._replace(x=res.x[:n])


class _TreeBlockJacobi:
    """Blockwise distributed Jacobi: tree is (op, inv_diag)."""

    def __call__(self, tree, r_block):
        return tree[1][:, None] * r_block

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


class _TreeBlockNeumann:
    """Blockwise distributed degree-1 Neumann:
    Z = 2 D^-1 R - D^-1 A (D^-1 R); the strategy mat-vec already
    handles (n_loc, s) blocks, so one extra block-mat-vec-comm per
    iteration."""

    def __init__(self, base_mv):
        self.base = base_mv

    def __call__(self, tree, r_block):
        op, inv_diag = tree
        c = inv_diag[:, None] * r_block
        return 2.0 * c - inv_diag[:, None] * self.base(op, c)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


class _PsumBlockGram:
    """(s, s) block Gram A^T B: local MXU contraction + one psum —
    block CG's only per-iteration collectives (two of these)."""

    def __init__(self, axis: str):
        self.axis = axis

    def __call__(self, a, b):
        # local shard contraction with cross-chunk compensation (same
        # numerics as the single-device _local_block_gram — round-4
        # VERDICT item 5); the cross-device psum adds only ~log2(p)
        # rounding on already-compensated partials
        from cgx.ops.tw32 import comp_block_gram

        g = comp_block_gram(a, b)
        return jax.lax.psum(g, self.axis)

    def __hash__(self):
        return hash((type(self), self.axis))

    def __eq__(self, other):
        return type(other) is type(self) and other.axis == self.axis


def sharded_block_cg_solve(
    mat,
    b_block: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    jitter_eps: float = 1e-15,
    method: str = "breakdown_free",
    rank_tol: float = 1e-12,
    precond: Optional[str] = None,
    bounds: Optional[tuple] = None,
    dense_fp64: str = "emulated",
    axis_name: str = ROWS_AXIS,
):
    """Row-block-sharded BLOCK CG: one shared Krylov space for all RHS
    columns over the mesh (cgx.solver.blockcg semantics). Per
    iteration: one block mat-vec (halo or all-gather comm) + the Gram
    psums — ONE fused (3s, 3s) psum for method='breakdown_free' (the
    default; rank-revealing, survives dependent/converged columns),
    two (s, s) psums for method='oleary' (textbook recurrence).

    Supported formats: DIA (halo/allgather) and dense (allgather);
    ``b_block`` is (n, s).

    precond: None | 'jacobi' | 'neumann' | 'chebyshev' — distributed
    blockwise preconditioning (breakdown_free only; adds one apply +
    one extra fused Gram psum per iteration).
    """
    from cgx.solver.blockcg import (
        BlockCGResult,
        bf_block_cg_loop,
        block_cg_loop,
    )

    if b_block.ndim != 2:
        raise ValueError("b_block must be (n, s)")
    if method not in ("breakdown_free", "oleary"):
        raise ValueError(f"unknown block CG method {method!r}")
    if precond is not None and method != "breakdown_free":
        raise ValueError("precond requires method='breakdown_free'")
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n, s = b_block.shape
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize

    b_np = np.asarray(b_block)
    b_pad = np.zeros((n_pad, s), dtype=b_np.dtype)
    b_pad[:n] = b_np
    b_dev = _put(b_pad, mesh, P(axis_name, None))
    dtype = b_dev.dtype

    mat, op_dev, mv, diag = _build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name,
        dense_fp64=dense_fp64,
    )
    if isinstance(mv, (_CsrAllGather, _EllAllGather, _DenseReduceScatter)):
        raise ValueError(
            "sharded block CG supports DIA (halo/allgather) and dense "
            "(allgather) operators"
        )
    op_spec = _op_spec(mat, axis_name, mv)

    pc_fn = None
    tree = op_dev
    tree_spec = op_spec
    if precond is not None:
        inv_diag = np.zeros(n_pad, dtype=dtype)
        inv_diag[:n] = 1.0 / np.asarray(diag, dtype=dtype)
        inv_diag_dev = _put(inv_diag, mesh, P(axis_name))
        tree = (op_dev, inv_diag_dev)
        tree_spec = (op_spec, P(axis_name))
        base_mv = mv
        mv = _TreeMatvec(base_mv)
        if precond == "jacobi":
            pc_fn = _TreeBlockJacobi()
        elif precond == "neumann":
            pc_fn = _TreeBlockNeumann(base_mv)
        elif precond == "chebyshev":
            from cgx.solver.chebyshev import host_spectral_bounds

            lo, hi = (
                bounds if bounds is not None else host_spectral_bounds(mat)
            )
            # chebyshev_poly's recurrence broadcasts over columns, so
            # the single-vector tree wrapper already handles blocks
            pc_fn = _TreeChebyPrecond(base_mv, float(lo), float(hi), 3)
        else:
            raise ValueError(f"unknown precond {precond!r}")

    if method == "breakdown_free":
        loop = partial(
            bf_block_cg_loop,
            matvec=mv,
            maxiter=int(maxiter),
            rank_tol=float(rank_tol),
            gram=_PsumBlockGram(axis_name),
            precond=pc_fn,
        )
    else:
        loop = partial(
            block_cg_loop,
            matvec=mv,
            maxiter=int(maxiter),
            jitter_eps=float(jitter_eps),
            gram=_PsumBlockGram(axis_name),
        )
    fn = jax.jit(
        jax.shard_map(
            loop,
            mesh=mesh,
            in_specs=(
                tree_spec,
                P(axis_name, None),
                P(axis_name, None),
                P(),
            ),
            out_specs=BlockCGResult(
                x=P(axis_name, None),
                iterations=P(),
                residual_norms=P(),
                converged=P(),
                breakdown=P(),
            ),
            check_vma=False,
        )
    )
    res = run_recorded(fn, 
        tree,
        b_dev,
        jnp.zeros_like(b_dev),
        jnp.asarray(tol, dtype),
    )
    return res._replace(x=res.x[:n])


class _ChebyLoop:
    """Adapter giving ``cheby_loop`` the (tree, b, x0, tol, nearzero)
    signature the shard_map below expects; the spectral bounds are baked
    in as compile-time constants (nearzero is unused — Chebyshev has no
    quotient to clamp)."""

    def __init__(self, lmin, lmax, mv, maxiter, check_every, dots):
        self.lmin = lmin
        self.lmax = lmax
        self.mv = mv
        self.maxiter = maxiter
        self.check_every = check_every
        self.dots = dots

    def __call__(self, tree, b, x0, tol, nearzero):
        from cgx.solver.chebyshev import cheby_loop

        return cheby_loop(
            tree,
            b,
            x0,
            jnp.asarray(self.lmin, b.dtype),
            jnp.asarray(self.lmax, b.dtype),
            tol,
            matvec=self.mv,
            maxiter=self.maxiter,
            check_every=self.check_every,
            dot=self.dots,
        )

    def _key(self):
        return (
            type(self),
            self.lmin,
            self.lmax,
            self.mv,
            self.maxiter,
            self.check_every,
            self.dots,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


class _TreeMatvec:
    def __init__(self, base):
        self.base = base

    def __call__(self, tree, p):
        return self.base(tree[0], p)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


class _TreePrecond:
    def __call__(self, tree, r):
        return tree[1] * r

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


class _TreeBlockJacobiPrecond:
    """Block-Jacobi apply: tree is (op, inv_blocks) with inv_blocks
    (nb_loc, m, m) sharded on the block axis. One local batched MXU
    contraction — no collectives (blocks never straddle shards)."""

    def __call__(self, tree, r):
        inv = tree[1]
        nbl, m, _ = inv.shape
        z = jnp.einsum(
            "bij,bj->bi", inv, r.reshape(nbl, m),
            precision=jax.lax.Precision.HIGHEST,
        )
        return z.reshape(r.shape)

    def __hash__(self):
        return hash(type(self))

    def __eq__(self, other):
        return type(other) is type(self)


def _op_spec(mat, axis_name, mv=None):
    if isinstance(mv, _DenseOzakiAllGather):
        # (int8 slices (S, n, n) row-sharded on dim 1, sigma (n,))
        return (P(None, axis_name, None), P(axis_name))
    if isinstance(mv, _DiaHalo) and mv.local_kernel == "stream2d":
        # pre-padded band planes (ndiag, psize*rows_lp, cols)
        return P(None, axis_name, None)
    if isinstance(mat, DIAMatrix):
        return P(None, axis_name)
    if isinstance(mat, ELLMatrix):
        return (P(axis_name, None), P(axis_name, None))
    if isinstance(mat, CSRMatrix):
        return (P(axis_name), P(axis_name), P(axis_name))
    return P(axis_name, None)


def _put(arr: np.ndarray, mesh: Mesh, spec: P):
    # Cast to the canonical dtype BEFORE the transfer: device_put of an
    # x64 host array with x64 disabled casts internally, and in
    # MULTI-PROCESS runs JAX's cross-process equality check then
    # compares the pre-cast original against the post-cast value and
    # aborts ("passed to device_put is not the same on each process").
    arr = np.asarray(arr)
    arr = arr.astype(jax.dtypes.canonicalize_dtype(arr.dtype), copy=False)
    return jax.device_put(arr, NamedSharding(mesh, spec))
