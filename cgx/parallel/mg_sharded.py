"""Multigrid-preconditioned CG over a 1-D device mesh.

Combines the two strongest results in the framework: the sharded CG
loop (halo-exchange mat-vecs, psum reductions) and the Galerkin V-cycle
(grid-independent iteration counts). The V-cycle itself is sharded:

- each shard owns a contiguous block of grid rows, so while the local
  grid-row count stays even, the 2x2 aggregation transfers are
  SHARD-LOCAL (a reshape + mean-pool / broadcast, zero communication);
- every level's smoother uses the existing ppermute halo mat-vec
  (O(bandwidth_level) bytes);
- when a level can no longer be pooled locally (odd local rows) or is
  small, the residual is all-gathered ONCE and the remaining tail is
  solved replicated (dense inverse) — tail levels are tiny by
  construction.

Constraints: the mesh size p must divide the grid side g, and sharded
coarsening proceeds while (g_level / p) is even — e.g. g=256 on p=8
shards down to g=8 locally. Violations fall back to the replicated
tail early (correct, just more gathered data).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.utils.collectives import run_recorded
from cgx.mats.containers import DIAMatrix
from cgx.parallel.mesh import ROWS_AXIS, make_mesh
from cgx.parallel.sharded_cg import _DiaHalo, _PsumDot
from cgx.solver.cg import CGResult, cg_loop
from cgx.solver.multigrid import _galerkin_bilinear, _galerkin_dia

# keep coarsening (sharded) until the level fits a small replicated
# dense tail; 33^2 covers a g=32 coarsest 2-D grid, 16^3 + margin the
# smallest even-coarsenable 3-D level (cell-centered bi/trilinear
# Galerkin WIDENS stencils — up to 7 points per axis at depth — so 3-D
# chains hit the halo<=shard limit earlier and need the larger tail)
_TAIL_MAX = {2: 1100, 3: 4200}


class _ShardedVCycle:
    """Hashable static V-cycle structure; level arrays ride the tree.

    tree layout: (fine_bands_loc, [level1_bands_loc, ...], tail_inv,
    smooth, fine_cycle_bands_or_None) where smooth is [] for
    Richardson or a per-sharded-level list of
    (color_masks_loc (nc, n_loc), dinv_loc (n_loc,)) for multicolor
    Gauss-Seidel. In mixed mode (cycle_precision='fp32') slot 4 holds
    an fp32 copy of the fine bands and every cycle array is fp32; the
    apply casts r fp64 -> fp32 -> fp64, so the CG recurrence stays
    fp64 while the V-cycle — smoothing mat-vecs, halos, transfers,
    tail solve — runs at hardware-rate fp32 (measured 0.087 s vs
    0.160 s at N=1e6 single-chip, iteration-count neutral).
    """

    def __init__(
        self,
        axis: str,
        p: int,
        grids: Tuple[int, ...],  # grid side per sharded level
        offsets: Tuple[Tuple[int, ...], ...],  # per sharded level
        damps: Tuple[float, ...],  # per sharded level
        pre: int,
        post: int,
        overcorrection: float,
        transfer: str = "bilinear",
        ndim: int = 2,
        smoother: str = "richardson",
        mixed: bool = False,
    ):
        self.axis = axis
        self.p = p
        self.grids = grids
        self.offsets = offsets
        self.damps = damps
        self.pre = pre
        self.post = post
        self.over = overcorrection
        self.transfer = transfer
        self.ndim = ndim
        self.smoother = smoother
        self.mixed = mixed
        self.mvs = tuple(
            _DiaHalo(axis, offsets[l], grids[l] ** ndim // p, p)
            for l in range(len(grids))
        )

    def _levels(self):
        return len(self.grids)

    def _local_shape(self, level):
        g = self.grids[level]
        # local block: (g/p) leading-axis slabs of a g^(ndim-1) plane
        return (g // self.p,) + (g,) * (self.ndim - 1)

    def _restrict_local(self, r, level):
        shape = self._local_shape(level)
        pooled = sum(((s // 2, 2) for s in shape), ())
        axes = tuple(2 * i + 1 for i in range(self.ndim))
        return r.reshape(pooled).mean(axis=axes).reshape(-1)

    def _prolong_local(self, e, level):
        shape = self._local_shape(level)
        a = e.reshape(tuple(s // 2 for s in shape))
        for axis in range(self.ndim):
            a = jnp.repeat(a, 2, axis=axis)
        return a.reshape(-1)

    # --- bilinear transfers: columns are shard-local; the row axis
    # needs a ONE-grid-row halo from each mesh neighbour (ppermute;
    # edge shards receive zeros = the Dirichlet exterior). Exact
    # adjoints of each other, matching the single-device pair
    # (cgx.solver.multigrid), so the V-cycle stays SPD. -------------

    def _row_halos(self, first_row, last_row):
        right_perm = [(i, i + 1) for i in range(self.p - 1)]
        left_perm = [(i + 1, i) for i in range(self.p - 1)]
        from_left = jax.lax.ppermute(last_row, self.axis, right_perm)
        from_right = jax.lax.ppermute(first_row, self.axis, left_perm)
        return from_left, from_right

    def _restrict_bilinear(self, r, level):
        from cgx.solver.multigrid import MGPreconditioner as MG

        a = r.reshape(self._local_shape(level))
        # trailing axes are shard-local
        for axis in range(1, self.ndim):
            a = MG._down_axis(a, axis)
        f0 = a[0::2]
        f1 = a[1::2]
        # fine slab 2i-1 of coarse slab 0 lives on the LEFT neighbour
        # (its last, odd, fine slab); fine slab 2i+2 of the last coarse
        # slab on the RIGHT neighbour (its first, even, fine slab)
        from_left, from_right = self._row_halos(a[:1], a[-1:])
        f1m = jnp.concatenate([from_left, f1[:-1]], axis=0)
        f0p = jnp.concatenate([f0[1:], from_right], axis=0)
        c = 0.75 * (f0 + f1) + 0.25 * (f1m + f0p)
        return c.reshape(-1)

    def _prolong_bilinear(self, e, level):
        from cgx.solver.multigrid import MGPreconditioner as MG

        shape = self._local_shape(level)
        a = e.reshape(tuple(s // 2 for s in shape))
        from_left, from_right = self._row_halos(a[:1], a[-1:])
        am1 = jnp.concatenate([from_left, a[:-1]], axis=0)
        ap1 = jnp.concatenate([a[1:], from_right], axis=0)
        r0 = 0.75 * a + 0.25 * am1
        r1 = 0.75 * a + 0.25 * ap1
        rows = jnp.stack([r0, r1], axis=1).reshape(
            (shape[0],) + a.shape[1:]
        )
        for axis in range(1, self.ndim):
            rows = MG._up_axis(rows, axis)
        return rows.reshape(-1)

    def _fine_bands(self, tree):
        return tree[4] if self.mixed else tree[0]

    def _gs_sweep(self, level, tree, z, r, *, start=0, reverse=False):
        """One multicolor Gauss-Seidel sweep with the halo mat-vec
        (fori_loop over the stacked local masks)."""
        bands = self._fine_bands(tree) if level == 0 else tree[1][level - 1]
        colors, dinv = tree[3][level]
        mv = self.mvs[level]
        nc = colors.shape[0]

        def body(i, z):
            mask = colors[nc - 1 - i] if reverse else colors[i]
            return z + mask * dinv * (r - mv(bands, z))

        return jax.lax.fori_loop(start, nc, body, z)

    def _v(self, level, tree, r):
        fine_bands, level_bands, tail_inv = tree[:3]
        if level == self._levels():
            # replicated tail: gather the tiny coarse residual once
            r_full = jax.lax.all_gather(r, self.axis, tiled=True)
            e_full = jnp.matmul(
                tail_inv, r_full, precision=jax.lax.Precision.HIGHEST
            )
            n_loc = r.shape[0]
            start = jax.lax.axis_index(self.axis) * n_loc
            return jax.lax.dynamic_slice(e_full, (start,), (n_loc,))
        bands = self._fine_bands(tree) if level == 0 else level_bands[level - 1]
        damp = self.damps[level]
        mv = self.mvs[level]
        if self.smoother == "gs":
            colors, dinv = tree[3][level]
            z = colors[0] * dinv * r  # first color from z0 = 0: no mat-vec
            z = self._gs_sweep(level, tree, z, r, start=1)
            for _ in range(self.pre - 1):
                z = self._gs_sweep(level, tree, z, r)
        else:
            z = damp * r
            for _ in range(self.pre - 1):
                z = z + damp * (r - mv(bands, z))
        resid = r - mv(bands, z)
        if self.transfer == "bilinear":
            e_c = self._v(level + 1, tree, self._restrict_bilinear(resid, level))
            corr = self._prolong_bilinear(e_c, level)
        else:
            e_c = self._v(level + 1, tree, self._restrict_local(resid, level))
            corr = self._prolong_local(e_c, level)
        z = z + self.over * corr
        if self.smoother == "gs":
            # adjoint (reversed-color) post-sweeps keep the V-cycle SPD
            for _ in range(self.post):
                z = self._gs_sweep(level, tree, z, r, reverse=True)
        else:
            for _ in range(self.post):
                z = z + damp * (r - mv(bands, z))
        return z

    def __call__(self, tree, r):
        if self.mixed:
            return self._v(0, tree, r.astype(jnp.float32)).astype(r.dtype)
        return self._v(0, tree, r)

    def _key(self):
        return (
            type(self), self.axis, self.p, self.grids, self.offsets,
            self.damps, self.pre, self.post, self.over, self.transfer,
            self.ndim, self.smoother, self.mixed,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()


class _TreeMV:
    """Fine-level matvec over the (fine, levels, tail) tree."""

    def __init__(self, base):
        self.base = base

    def __call__(self, tree, p):
        return self.base(tree[0], p)

    def __hash__(self):
        return hash((type(self), self.base))

    def __eq__(self, other):
        return type(other) is type(self) and other.base == self.base


def _build_sharded_mg(
    mat: DIAMatrix,
    n: int,
    g: Optional[int],
    mesh: Mesh,
    *,
    pre_smooth: int,
    post_smooth: int,
    omega: float,
    overcorrection: Optional[float],
    transfer: str,
    smoother: str,
    ndim: int,
    axis_name: str,
    cycle_precision: str = "fp64",
    solve_dtype=None,
):
    """Shared hierarchy/tree construction for the sharded MG entry
    points. Returns (vcycle, mv, b-independent tree builder pieces):
    (vcycle, base_halo_mv, tree, tree_spec, g).

    ``solve_dtype`` is the dtype the CG recurrence runs in (taken from
    the device-resident b) — the hierarchy is built to match it so a
    float32 b under jax_enable_x64 still yields a homogeneous
    while_loop carry."""
    p = mesh.devices.size
    if g is None:
        g = int(round(n ** (1.0 / ndim)))
    if g**ndim != n:
        raise ValueError(f"b length {n} is not a {g}^{ndim} grid")
    if g % p != 0:
        raise ValueError(f"mesh size {p} must divide the grid side {g}")
    if transfer not in ("bilinear", "aggregation"):
        raise ValueError(f"unknown transfer {transfer!r}")
    if smoother not in ("richardson", "gs"):
        raise ValueError(f"unknown smoother {smoother!r}")
    if overcorrection is None:
        # bilinear's coarse correction is exact on smooth error; the
        # piecewise-constant aggregation transfer needs the classic
        # ~1.8x boost (see cgx.solver.multigrid)
        overcorrection = 1.8 if transfer == "aggregation" else 1.0
    galerkin = _galerkin_bilinear if transfer == "bilinear" else _galerkin_dia

    host_fine = DIAMatrix(mat.shape, tuple(mat.offsets), np.asarray(mat.bands, np.float64))

    # build hierarchy: sharded levels while local grid rows stay even,
    # halos fit, and the level is bigger than the replicated tail cap
    grids: List[int] = []
    offsets: List[Tuple[int, ...]] = []
    damps: List[float] = []
    level_mats: List[DIAMatrix] = []
    cur, cur_g = host_fine, g
    tail_max = _TAIL_MAX.get(ndim, 1100)
    while True:
        m_loc = cur_g // p
        n_loc = cur_g**ndim // p
        halo = max(max(abs(o) for o in cur.offsets), 1)
        can_shard = (
            m_loc % 2 == 0
            and halo <= n_loc
            and cur_g**ndim > tail_max
            and cur_g % 2 == 0
        )
        if not can_shard:
            break
        grids.append(cur_g)
        offsets.append(tuple(cur.offsets))
        d0 = cur.offsets.index(0)
        damps.append(float(omega / np.max(cur.bands[d0])))
        level_mats.append(cur)
        from cgx.solver.multigrid import _galerkin_cached

        cur = _galerkin_cached(galerkin, cur, cur_g, ndim)
        cur_g //= 2
    # zero sharded levels is a legal degenerate case (a tail-sized
    # grid on many shards): the "V-cycle" is then one replicated exact
    # solve per apply — expensive but correct, and small by the cap
    fine_halo = max(max(abs(o) for o in host_fine.offsets), 1)
    if fine_halo > n // p:
        raise ValueError(
            f"fine-level halo {fine_halo} exceeds the shard size "
            f"{n // p}; use fewer shards or plain sharded_cg_solve"
        )
    tail = cur  # replicated coarsest
    if tail.shape[0] > tail_max:
        raise ValueError(
            f"replicated tail would be {tail.shape[0]} > {tail_max}; "
            "use more coarsenable geometry (g = p * 2^k) or plain "
            "sharded_cg_solve"
        )
    tail_inv = np.linalg.inv(tail.to_dense())

    if cycle_precision not in ("fp64", "fp32"):
        raise ValueError(f"unknown cycle_precision {cycle_precision!r}")
    if solve_dtype is None:
        solve_dtype = (
            np.float64 if jax.config.jax_enable_x64 else np.float32
        )
    np_dtype = np.dtype(solve_dtype)
    if np_dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        raise ValueError(f"unsupported solve dtype {np_dtype}")
    # "mixed" = fp32 V-cycle inside an fp64 recurrence; with an fp32 b
    # the whole solve is already fp32 and there is nothing to mix
    mixed = cycle_precision == "fp32" and np_dtype == np.dtype(np.float64)
    vcycle = _ShardedVCycle(
        axis_name, p, tuple(grids), tuple(offsets), tuple(damps),
        int(pre_smooth), int(post_smooth), float(overcorrection),
        transfer, int(ndim), smoother, mixed,
    )
    base_mv = _DiaHalo(axis_name, tuple(host_fine.offsets), n // p, p)

    def put(arr, spec):
        from cgx.parallel.sharded_cg import _put

        return _put(arr, mesh, spec)

    np_cycle = (
        np.float32 if (mixed or np_dtype == np.dtype(np.float32))
        else np_dtype
    )

    smooth_data, smooth_spec = [], []
    if smoother == "gs":
        from cgx.solver.multigrid import _color_masks

        for lvl, m in enumerate(level_mats):
            masks = _color_masks(grids[lvl], ndim, m.offsets)
            if masks is None:
                raise ValueError(
                    "smoother='gs' needs grid-stencil levels (level "
                    f"{lvl} offsets {m.offsets} do not decode on the "
                    f"{grids[lvl]}^{ndim} grid)"
                )
            d0 = m.offsets.index(0)
            smooth_data.append(
                (
                    put(
                        np.stack(masks).astype(np_cycle),
                        P(None, axis_name),
                    ),
                    put((1.0 / m.bands[d0]).astype(np_cycle), P(axis_name)),
                )
            )
            smooth_spec.append((P(None, axis_name), P(axis_name)))

    tree = (
        # fine bands always ride slot 0 (the CG mat-vec needs them even
        # in the zero-sharded-level degenerate case)
        put(host_fine.bands.astype(np_dtype), P(None, axis_name)),
        [
            put(m.bands.astype(np_cycle), P(None, axis_name))
            for m in level_mats[1:]
        ],
        put(tail_inv.astype(np_cycle), P()),
        smooth_data,
        # mixed mode: the V-cycle's own fp32 copy of the fine bands
        put(host_fine.bands.astype(np_cycle), P(None, axis_name))
        if mixed
        else None,
    )
    tree_spec = (
        P(None, axis_name),
        [P(None, axis_name) for _ in level_mats[1:]],
        P(),
        smooth_spec,
        P(None, axis_name) if mixed else None,
    )
    return vcycle, base_mv, tree, tree_spec, g


def sharded_mg_cg_solve(
    mat: DIAMatrix,
    b: np.ndarray,
    g: Optional[int] = None,
    *,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    pre_smooth: int = 2,
    post_smooth: int = 2,
    omega: float = 0.8,
    overcorrection: Optional[float] = None,
    transfer: str = "bilinear",
    smoother: str = "richardson",
    cycle_precision: str = "fp64",
    ndim: int = 2,
    axis_name: str = ROWS_AXIS,
) -> CGResult:
    """Row-sharded CG with a sharded Galerkin V-cycle preconditioner.

    ``cycle_precision='fp32'`` runs the whole V-cycle (smoothing
    mat-vecs, halos, transfers, tail solve) at fp32 inside the fp64 CG
    recurrence — iteration-count neutral, fp64-quality answers, and
    the V-cycle cost drops to hardware-rate fp32 on TPU (measured
    1.8x on the single-chip N=1e6 problem).

    Args:
      mat: banded host matrix on a g^ndim grid (g inferred when
        omitted; ndim=3 for lap3d_fd problems — trilinear transfers
        exchange one PLANE halo per level).
      b: right-hand side, length g^ndim.

    Requires the mesh size to divide g. Iteration counts are
    grid-independent (the multigrid property) while per-iteration
    communication stays O(bandwidth) halos + psums.
    """
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    # solve dtype = what b will canonicalize to on device (NOT the
    # global x64 flag — a float32 b must get a float32 hierarchy)
    dtype = jax.dtypes.canonicalize_dtype(np.asarray(b).dtype)
    vcycle, base_mv, tree, tree_spec, g = _build_sharded_mg(
        mat, n, g, mesh,
        pre_smooth=pre_smooth, post_smooth=post_smooth, omega=omega,
        overcorrection=overcorrection, transfer=transfer,
        smoother=smoother, ndim=ndim, axis_name=axis_name,
        cycle_precision=cycle_precision, solve_dtype=dtype,
    )
    mv = _TreeMV(base_mv)

    from cgx.parallel.sharded_cg import _put

    b_dev = _put(b, mesh, P(axis_name))

    fn = jax.jit(
        jax.shard_map(
            partial(
                cg_loop,
                maxiter=int(maxiter),
                history=int(history),
                dot_precision=None,
                matvec=mv,
                precond=vcycle,
                dot=_PsumDot(axis_name, None),
            ),
            mesh=mesh,
            in_specs=(tree_spec, P(axis_name), P(axis_name), P(), P()),
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
    return run_recorded(fn, 
        tree,
        b_dev,
        jnp.zeros_like(b_dev),
        jnp.asarray(tol, dtype),
        jnp.asarray(nearzero, dtype),
    )


class _ColumnsVCycle:
    """Blockwise wrapper: the sharded V-cycle vmapped across RHS
    columns — ppermute/all_gather have batching rules, so every level
    sends ONE batched halo message for the whole block instead of s
    sequential chains (the latency-bound cost on a mesh)."""

    def __init__(self, vcycle):
        self.vcycle = vcycle

    def __call__(self, tree, r_block):
        return jax.vmap(
            lambda col: self.vcycle(tree, col), in_axes=1, out_axes=1
        )(r_block)

    def __hash__(self):
        return hash((type(self), self.vcycle))

    def __eq__(self, other):
        return type(other) is type(self) and other.vcycle == self.vcycle


def sharded_mg_block_cg_solve(
    mat: DIAMatrix,
    b_block: np.ndarray,
    g: Optional[int] = None,
    *,
    mesh: Optional[Mesh] = None,
    n_devices: Optional[int] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    rank_tol: float = 1e-12,
    pre_smooth: int = 2,
    post_smooth: int = 2,
    omega: float = 0.8,
    overcorrection: Optional[float] = None,
    transfer: str = "bilinear",
    smoother: str = "richardson",
    cycle_precision: str = "fp64",
    ndim: int = 2,
    axis_name: str = ROWS_AXIS,
):
    """Row-sharded breakdown-free BLOCK CG with the sharded Galerkin
    V-cycle applied per RHS column — the production multi-RHS path:
    grid-independent iteration counts for the whole block, one shared
    Krylov space, survives dependent/converged columns (rank-revealing
    directions), and the per-iteration communication is one block halo
    mat-vec + s V-cycle halo chains + two fused Gram psums.
    """
    from cgx.solver.blockcg import BlockCGResult, bf_block_cg_loop
    from cgx.parallel.sharded_cg import _PsumBlockGram, _put

    if b_block.ndim != 2:
        raise ValueError("b_block must be (n, s)")
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    n = b_block.shape[0]
    if maxiter is None:
        maxiter = n
    dtype = jax.dtypes.canonicalize_dtype(np.asarray(b_block).dtype)
    vcycle, base_mv, tree, tree_spec, g = _build_sharded_mg(
        mat, n, g, mesh,
        pre_smooth=pre_smooth, post_smooth=post_smooth, omega=omega,
        overcorrection=overcorrection, transfer=transfer,
        smoother=smoother, ndim=ndim, axis_name=axis_name,
        cycle_precision=cycle_precision, solve_dtype=dtype,
    )
    mv = _TreeMV(base_mv)  # the halo mat-vec handles (n_loc, s) blocks

    b_dev = _put(np.asarray(b_block), mesh, P(axis_name, None))

    loop = partial(
        bf_block_cg_loop,
        matvec=mv,
        maxiter=int(maxiter),
        rank_tol=float(rank_tol),
        gram=_PsumBlockGram(axis_name),
        precond=_ColumnsVCycle(vcycle),
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
    return run_recorded(fn, 
        tree,
        b_dev,
        jnp.zeros_like(b_dev),
        jnp.asarray(tol, dtype),
    )
