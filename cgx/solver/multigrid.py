"""Geometric multigrid preconditioner for grid-Laplacian problems.

The O(1)-iteration lever the reference family is missing: CG on the
g x g 5-point Laplacian needs O(g) iterations (488 at g=100, 6703 at
N=1e6); V-cycle-preconditioned CG needs O(10) regardless of g.

TPU-native construction — every component is data-parallel:

- smoothing: scalar Richardson ``z += (omega/max(diag)) (r - A z)``
  (pure VPU; no triangular solves). The scalar damping makes the
  smoother an exactly symmetric operator at EVERY level — pointwise
  Jacobi would only be symmetric for constant diagonals, which the
  Galerkin coarse operators do not have — so the V-cycle is exactly
  SPD and plain (non-flexible) CG theory applies;
- transfer: 2x2 cell aggregation — restriction is a reshape +
  mean-pool, prolongation its (scaled) transpose, a broadcast; both
  compile to layout changes + elementwise ops;
- coarse operators: **Galerkin** products ``A_c = R A P`` precomputed
  at setup (exact, so the V-cycle is a symmetric positive definite
  operator and CG theory applies — a rediscretized hierarchy would
  only be approximately symmetric);
- coarsest level: dense solve via a precomputed factor-free inverse
  (one small matmul).

Built for the ``lap2d_fd`` family (the reference's .mtx matrix) and
the ``lap3d_fd`` 7-point family (``ndim=3``: 2x2x2 aggregation or
trilinear transfers); any DIA operator living on a g^ndim grid with
even-g coarsening works.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgx.mats.containers import DIAMatrix
from cgx.solver.operators import DiaOperator, banded_matvec

# Galerkin band probing: max words of (batch, n_fine) intermediate per
# buffer before the probe fan-out switches from one vmap to a scan of
# vmapped batches (~0.8 GB f32; ~8 such buffers live during the build,
# sized against the 16 GB v5e HBM with the solve state resident).
PROBE_WORDS_BUDGET = 2 * 10**8

_CHEB_DEGREE = 40  # coarsest-level Chebyshev solve degree


def _group_index(g: int, ndim: int = 2) -> np.ndarray:
    """Flat fine index -> flat coarse index for 2^ndim aggregation."""
    gc = g // 2
    idx = np.arange(g**ndim)
    out = np.zeros_like(idx)
    rem = idx
    for axis in range(ndim):
        coord = rem // (g ** (ndim - 1 - axis))
        rem = rem % (g ** (ndim - 1 - axis))
        out = out * gc + coord // 2
    return out


def _dia_to_coo(mat: DIAMatrix):
    n = mat.shape[0]
    rows_l, cols_l, vals_l = [], [], []
    for d, off in enumerate(mat.offsets):
        lo, hi = max(0, -off), min(n, n - off)
        r = np.arange(lo, hi)
        v = mat.bands[d, lo:hi]
        keep = v != 0.0
        rows_l.append(r[keep])
        cols_l.append(r[keep] + off)
        vals_l.append(v[keep])
    return (
        np.concatenate(rows_l),
        np.concatenate(cols_l),
        np.concatenate(vals_l),
    )


def _accumulate_bands(bands: dict, crow, ccol, vals, n_c: int) -> None:
    """Scatter-add COO triplets into per-offset band vectors.

    Deliberately avoids the sort-the-world pattern
    (concatenate + np.unique over O(width^2 nnz) keys): the coarse
    offsets take only a handful of values, so a tiny histogram finds
    them and one np.bincount per offset does the row accumulation —
    O(nnz) with no large sort. On the single-core build hosts this is
    the difference between ~400 s and a few seconds for the N=1e6
    hierarchy."""
    off = (ccol - crow).astype(np.int64)
    if off.size == 0:
        return
    omin = int(off.min())
    hist = np.bincount(off - omin)
    for oi in np.nonzero(hist)[0]:
        o = int(oi) + omin
        m = off == o
        band = bands.get(o)
        if band is None:
            band = np.zeros(n_c)
            bands[o] = band
        band += np.bincount(crow[m], weights=vals[m], minlength=n_c)


def _bands_to_dia(bands: dict, n_c: int) -> DIAMatrix:
    offs = sorted(o for o, b in bands.items() if b.any())
    arr = np.stack([bands[o] for o in offs])
    return DIAMatrix((n_c, n_c), tuple(int(o) for o in offs), arr)


# --- on-device Galerkin construction (VERDICT r1 item 5) ---------------
#
# The host build's cost is O(width^2) passes of per-offset masked
# bincounts over the fine nnz (~80 s at N=1e6 on a 1-core host), and a
# scatter-add port of it is even worse on TPU (serialized scatters,
# emulated fp64, plus a large device->host band download through the
# relay). The TPU-native construction is BAND PROBING: A_c = R A P is
# banded with per-axis reach <= r_c, so probing it with the
# (2 r_c + 1)^ndim lattice-class indicator vectors recovers every band
# exactly — each probe is one prolong -> banded mat-vec -> restrict on
# the fine grid, i.e. the V-cycle's own shift/interleave VPU ops, with
# no scatter, no COO, and the hierarchy never leaving the device.
# Separation guarantees exactness: two same-class coarse columns
# differ by >= 2 r_c + 1 per axis, so at most one lies within the
# stencil reach of any row (classic CPR/graph-coloring probing), and
# out-of-grid columns read as exact zeros.


def _axis_reach(offsets, g: int, ndim: int) -> int:
    """Max per-axis stencil reach of the DIA offsets on a g^ndim grid
    (generous decode bound — Galerkin reach saturates at 3/axis)."""
    coords = _decode_offsets(offsets, g, ndim, max_reach=16)
    if coords is None:
        raise ValueError(
            f"offsets {offsets} do not decode on the {g}^{ndim} grid"
        )
    return max((abs(d) for c in coords for d in c), default=1) or 1


def _coarse_reach(offsets, g: int, ndim: int, transfer: str) -> int:
    """EXACT per-axis reach bound for R A P.

    Cell-centered bilinear (``_up_axis``: fine 2j, 2j+1 carry coarse j,
    fine 2j-1 and 2j+2 carry it at weight 1/4): coarse j's fine support
    is {2j-1 .. 2j+2}, and R = P^T reads the same window around 2k, so
    (R A P)[k, j] != 0 requires |2(j-k)| <= 1 + r + 2, i.e.
    |j-k| <= (r+3)//2. Aggregation (broadcast / mean over {2j, 2j+1}):
    |2(j-k)| <= r + 1, i.e. (r+1)//2. The previous safe bound
    ((r+5)//2) probed one full ring over — q^ndim = 49 lattice classes
    where 25 (bilinear, r<=2) or 9 (aggregation, r=1) suffice; at the
    N=1e7 flagship's finest level that ring was half the probe fan-out
    and a 337-s-compile program (results/hw_queue_r4/mg_setup_profile).
    Exactness vs the host build is CI-pinned for both transfers in 2-D
    and 3-D including widened second levels (test_multigrid.py)."""
    r = _axis_reach(offsets, g, ndim)
    return (r + 3) // 2 if transfer == "bilinear" else (r + 1) // 2


def galerkin_probe(
    bands: jnp.ndarray,
    offsets,
    g: int,
    ndim: int = 2,
    transfer: str = "bilinear",
):
    """Galerkin product on the accelerator via band probing.

    Args:
      bands: device (ndiag, g^ndim) DIA bands of the fine level.
      offsets: static fine DIA offsets.
      transfer: 'bilinear' (A_c = P^T A P) or 'aggregation'
        (A_c = mean-pool . A . broadcast), matching the V-cycle's own
        transfer pair so the hierarchy stays exactly Galerkin.

    Returns (coarse_bands, coarse_offsets): device (n_off, (g/2)^ndim)
    bands + static offsets, all-zero candidates dropped. Work is
    (2 r_c + 1)^ndim probes x O(n_fine) VPU flops; the only
    device->host traffic is the per-candidate nonzero flags. The
    probes ride ONE vmapped prolong->matvec->restrict, extraction is
    ONE take_along_axis gather, and alias merging one tiny matmul, so
    the whole build is a ~50-op program per (offsets, g) config —
    compile-time matters through a remote compile service, and the
    jitted builder is cached per static config.
    """
    offsets = tuple(int(o) for o in offsets)
    fn, flat_offsets = _probe_builder(
        offsets, int(g), int(ndim), transfer, str(jnp.asarray(bands).dtype)
    )
    cand, nz = fn(bands)
    nz = np.asarray(nz)  # tiny flag download
    keep = [i for i in range(len(flat_offsets)) if nz[i]]
    coarse_offsets = tuple(int(flat_offsets[i]) for i in keep)
    return cand[np.asarray(keep, np.int32)], coarse_offsets


@functools.lru_cache(maxsize=64)
def _probe_builder(offsets, g, ndim, transfer, dtype_name):
    """Cached jitted probe program + its static candidate offsets."""
    import itertools

    import jax

    gc = g // 2
    n_c = gc**ndim
    rc = _coarse_reach(offsets, g, ndim, transfer)
    q = 2 * rc + 1

    if transfer == "bilinear":
        prolong = lambda v: MGPreconditioner._prolong_bilinear(v, gc, ndim)
        restrict = lambda y: MGPreconditioner._restrict_bilinear(y, g, ndim)
    elif transfer == "aggregation":
        prolong = lambda v: MGPreconditioner._prolong(v, gc, ndim)
        restrict = lambda y: MGPreconditioner._restrict(y, g, ndim)
    else:
        raise ValueError(f"unknown transfer {transfer!r}")

    # lattice classes (q^ndim,) x (ndim,) and per-axis candidate deltas
    classes = np.array(
        list(itertools.product(range(q), repeat=ndim)), np.int32
    )
    deltas = np.array(
        list(itertools.product(range(-rc, rc + 1), repeat=ndim)), np.int32
    )
    # group per-axis deltas by their FLAT offset: on small coarse
    # grids distinct (dx, dy, ...) alias to the same flat diagonal
    # (e.g. gc=4: (-1,-2) and (-2,2) are both -6), and the flat DIA
    # band is their sum — exactly how the host build accumulates.
    # merge = tiny (n_flat, n_deltas) 0/1 matmul on device.
    flat_of_delta = deltas @ np.array(
        [gc ** (ndim - 1 - a) for a in range(ndim)], np.int64
    )
    flat_offsets = sorted(set(int(x) for x in flat_of_delta))
    merge_np = np.zeros((len(flat_offsets), len(deltas)))
    for j, f in enumerate(flat_of_delta):
        merge_np[flat_offsets.index(int(f)), j] = 1.0

    @jax.jit
    def run(bands):
        dtype = bands.dtype
        # (ndim, n_c) coarse coordinates from one iota
        flat = jnp.arange(n_c, dtype=jnp.int32)
        coords = []
        rem = flat
        for a in range(ndim):
            step = gc ** (ndim - 1 - a)
            coords.append(rem // step)
            rem = rem % step
        coords = jnp.stack(coords)  # (ndim, n_c)
        # all q^ndim probe vectors at once: (n_classes, n_c)
        match = (
            coords[None, :, :] % q == classes[:, :, None]
        )  # (n_classes, ndim, n_c)
        probes = jnp.all(match, axis=1).astype(dtype)
        # one vmapped prolong -> banded matvec -> restrict. The vmap
        # materializes (n_classes, n_fine) intermediates; at the
        # finest level of an N=1e7 grid that is 49 x 1.024e7 f32 = 2.1
        # GB per buffer with ~8 live at once — past the 16 GB chip
        # (measured OOM, results/hw_queue_r3/fp64q_g3200_tw.log). Cap
        # the live footprint by scanning over probe batches when the
        # full fan-out exceeds PROBE_WORDS_BUDGET words per buffer.
        apply = lambda v: restrict(
            banded_matvec(bands, offsets, prolong(v))
        )
        n_fine = (2**ndim) * n_c
        n_classes = q**ndim
        if n_classes * n_fine > PROBE_WORDS_BUDGET:
            bs = max(1, PROBE_WORDS_BUDGET // n_fine)
            y = jax.lax.map(apply, probes, batch_size=int(bs))
        else:
            y = jax.vmap(apply)(probes)  # (n_classes, n_c)
        # flat class id of column (x + d) for every candidate d and
        # coarse position x: (n_deltas, n_c)
        cls = jnp.zeros((len(deltas), n_c), jnp.int32)
        for a in range(ndim):
            cls = cls * q + (coords[a][None, :] + deltas[:, a : a + 1]) % q
        # cand[k, i] = y[cls[k, i], i] — ONE gather
        cand = jnp.take_along_axis(y, cls, axis=0)
        merged = jnp.asarray(merge_np, dtype) @ cand  # alias merge
        return merged, jnp.any(merged != 0, axis=1)

    return run, flat_offsets


def _galerkin_bilinear_dev(mat: DIAMatrix, g: int, ndim: int = 2) -> DIAMatrix:
    """Host-API wrapper over :func:`galerkin_probe` (bilinear);
    numerically equal to :func:`_galerkin_bilinear` up to fp
    reassociation. Prefer galerkin_probe directly to keep the
    hierarchy on device."""
    bands, offs = galerkin_probe(
        jnp.asarray(mat.bands), mat.offsets, g, ndim, "bilinear"
    )
    n_c = (g // 2) ** ndim
    return DIAMatrix((n_c, n_c), offs, np.asarray(bands, np.float64))


def _galerkin_dia_dev(mat: DIAMatrix, g: int, ndim: int = 2) -> DIAMatrix:
    """Host-API wrapper over :func:`galerkin_probe` (aggregation)."""
    bands, offs = galerkin_probe(
        jnp.asarray(mat.bands), mat.offsets, g, ndim, "aggregation"
    )
    n_c = (g // 2) ** ndim
    return DIAMatrix((n_c, n_c), offs, np.asarray(bands, np.float64))


_GALERKIN_CACHE: dict = {}
_GALERKIN_CACHE_MAX_BYTES = 256 * 1024 * 1024  # bound host RAM, not entries


def _galerkin_cached(fn, mat: DIAMatrix, g: int, ndim: int):
    """Content-addressed memoization of Galerkin products: hierarchy
    construction is pure in (bands, offsets, g, ndim, transfer), and
    solver entry points routinely rebuild the same chain (e.g. several
    preconditioner configs over one matrix), so coarse levels are
    cached by a blake2b hash of the band data (~0.1 s for the N=1e6
    fine level vs seconds-to-minutes for the product)."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(np.ascontiguousarray(mat.bands).tobytes())
    key = (fn.__name__, g, ndim, tuple(mat.offsets), h.hexdigest())
    hit = _GALERKIN_CACHE.get(key)
    if hit is not None:
        return hit
    out = fn(mat, g, ndim)
    total = out.bands.nbytes
    # evict oldest-first until the new entry fits the byte budget
    for k in list(_GALERKIN_CACHE):
        if (
            sum(v.bands.nbytes for v in _GALERKIN_CACHE.values()) + total
            <= _GALERKIN_CACHE_MAX_BYTES
        ):
            break
        _GALERKIN_CACHE.pop(k)
    if total <= _GALERKIN_CACHE_MAX_BYTES:
        _GALERKIN_CACHE[key] = out
    return out


def _galerkin_dia(mat: DIAMatrix, g: int, ndim: int = 2) -> DIAMatrix:
    """A_c = (1/2^ndim) Agg A Agg^T as a banded matrix, via per-offset
    bincount accumulation — O(nnz), no global sort. The Galerkin of a
    banded stencil under 2^ndim aggregation stays banded (a 5-point
    stencil becomes at most 9 diagonals, a 7-point at most 27), so the
    whole hierarchy keeps DIA's VPU mat-vec."""
    grp = _group_index(g, ndim)
    rows, cols, vals = _dia_to_coo(mat)
    gc = g // 2
    n_c = gc**ndim
    bands: dict = {}
    _accumulate_bands(
        bands,
        grp[rows].astype(np.int64),
        grp[cols].astype(np.int64),
        vals / float(2**ndim),
        n_c,
    )
    return _bands_to_dia(bands, n_c)


def _decode_offsets(offsets, g: int, ndim: int, max_reach: int = 2):
    """Flat DIA offsets -> per-axis coordinate offsets with
    |d| <= max_reach per axis. Returns None if any offset doesn't
    decode — the caller then refuses to color."""
    out = []
    for o in offsets:
        o = int(o)
        coords = []
        rem = o
        for axis in range(ndim - 1, -1, -1):
            step = g**axis
            d = int(np.round(rem / step)) if axis > 0 else rem
            if abs(d) > max_reach:
                return None
            coords.append(d)
            rem -= d * step
        if rem != 0:
            return None
        out.append(tuple(reversed(coords)))
    return out


def _color_masks(g: int, ndim: int, offsets) -> Optional[List[np.ndarray]]:
    """Gauss-Seidel coloring masks for a banded grid level.

    Decodes the stencil's per-axis reach R, then colors by the
    per-axis coordinate mod (R+1): two same-color cells differ by a
    multiple of R+1 along every axis, so any nonzero difference within
    the stencil reach is impossible — the coloring always decouples.
    Special case: when R = 1 and every off-diagonal offset flips the
    total parity (i+j+... — the 5/7-point stencils), the classic
    2-coloring (red-black) suffices. Level census for this hierarchy:
    fine 5/7-point -> 2 colors; aggregation Galerkin (3^ndim) -> 2^ndim
    colors; cell-centered bilinear Galerkin (5^ndim, reach 2) ->
    3^ndim colors. Returns a list of {0,1} float masks (flat, length
    g^ndim), or None when the stencil doesn't decode (no safe
    coloring)."""
    coords = _decode_offsets(offsets, g, ndim)
    if coords is None:
        return None
    reach = max((max(abs(d) for d in c) for c in coords), default=1)
    grids = np.meshgrid(*(np.arange(g) for _ in range(ndim)), indexing="ij")
    if reach <= 1 and all(sum(c) % 2 == 1 for c in coords if any(c)):
        total = sum(grids) % 2
        return [
            (total == c).astype(np.float64).reshape(-1) for c in (0, 1)
        ]
    q = reach + 1
    color = sum((grids[a] % q) * (q**a) for a in range(ndim))
    masks = [
        (color == c).astype(np.float64).reshape(-1)
        for c in range(q**ndim)
    ]
    return [m for m in masks if m.any()]


def _bilinear_p(g: int, ndim: int = 2):
    """Cell-centered (bi/tri)linear prolongation P (g^ndim x gc^ndim)
    as fixed-width index/weight planes: per fine cell, the tensor
    product of 1-D weights (3/4 on the containing coarse cell, 1/4 on
    the nearest neighbour; boundary neighbours dropped — Dirichlet
    exterior). Returns (idx (g^ndim, 2^ndim) int64,
    w (g^ndim, 2^ndim) float64)."""
    gc = g // 2
    f = np.arange(g)
    main = f // 2
    nb = np.where(f % 2 == 0, f // 2 - 1, f // 2 + 1)
    nb_ok = (nb >= 0) & (nb < gc)
    nb = np.clip(nb, 0, gc - 1)
    # per-axis (index, weight) pairs: [(main, .75), (nb, .25 or 0)]
    ax_idx = np.stack([main, nb], axis=1)  # (g, 2)
    ax_w = np.stack(
        [np.full(g, 0.75), np.where(nb_ok, 0.25, 0.0)], axis=1
    )  # (g, 2)
    # tensor product over the ndim fine-cell coordinates
    n_f = g**ndim
    coords = []
    rem = np.arange(n_f)
    for axis in range(ndim):
        coords.append(rem // (g ** (ndim - 1 - axis)))
        rem = rem % (g ** (ndim - 1 - axis))
    idx = np.zeros((n_f, 1), dtype=np.int64)
    w = np.ones((n_f, 1))
    for c in coords:
        idx = (idx[:, :, None] * gc + ax_idx[c][:, None, :]).reshape(n_f, -1)
        w = (w[:, :, None] * ax_w[c][:, None, :]).reshape(n_f, -1)
    return idx, w


def _galerkin_bilinear(mat: DIAMatrix, g: int, ndim: int = 2) -> DIAMatrix:
    """A_c = P^T A P with the cell-centered (bi/tri)linear P —
    O(4^ndim nnz) host setup. Stencils WIDEN under cell-centered
    linear transfers (unlike vertex-centered 9-point-stable ones): a
    5-point start saturates at ~25 bands in 2-D (~81+ in 3-D) after a
    couple of levels — per-axis reach converges to the fixed point of
    r -> ceil((r+3)/2) = 3. Every level stays banded, so the hierarchy
    keeps DIA's VPU mat-vec; use transfer='aggregation' when minimal
    coarse bandwidth matters more than transfer accuracy (e.g. to
    shard deeper before the halo exceeds the shard size)."""
    pidx, pw = _bilinear_p(g, ndim)
    rows, cols, vals = _dia_to_coo(mat)
    gc = g // 2
    n_c = gc**ndim
    width = pidx.shape[1]
    bands: dict = {}
    for a in range(width):
        wa = pw[rows, a]
        ia = pidx[rows, a]
        for b_ in range(width):
            v = vals * wa * pw[cols, b_]
            keep = v != 0.0
            _accumulate_bands(
                bands, ia[keep], pidx[cols[keep], b_], v[keep], n_c
            )
    return _bands_to_dia(bands, n_c)


class MGPreconditioner:
    """Symmetric V-cycle preconditioner: ``z = M^{-1} r``.

    Apply is a pure function of device arrays captured at build time —
    usable directly as ``cg_solve(..., precond=mg.apply)`` and under
    jit/while_loop.
    """

    def __init__(
        self,
        fine: DiaOperator,
        g: int,
        *,
        ndim: int = 2,
        min_coarse_grid: Optional[int] = None,
        pre_smooth: int = 2,
        post_smooth: int = 2,
        omega: float = 0.8,
        overcorrection: Optional[float] = None,
        transfer: str = "bilinear",
        smoother: str = "richardson",
        dtype=None,
        galerkin_setup: str = "auto",
        cycle: str = "v",
    ):
        # transfer='bilinear' (default): cell-centered bilinear P with
        # R = P^T — the textbook pairing whose coarse-grid correction
        # is exact on smooth error, so no overcorrection is needed.
        # transfer='aggregation': 2x2 mean-pool/broadcast; the
        # piecewise-constant transfer under-represents smooth error
        # energy, so the prolongated correction is scaled by ~1.8-2
        # (the classic fix; measured here: g=256 full-depth k=90->35).
        # A scalar times P = c R^T keeps either V-cycle symmetric.
        if transfer not in ("bilinear", "aggregation"):
            raise ValueError(f"unknown transfer {transfer!r}")
        self.transfer = transfer
        # smoother='richardson' (default): scalar-damped
        # ``z += (omega/max diag)(r - A z)`` — one banded mat-vec per
        # sweep, exactly symmetric with identical pre/post sweeps.
        # smoother='gs': multicolor Gauss-Seidel — red-black for the
        # parity-flipping 5/7-point fine stencils, 2^ndim parity-vector
        # colors for the 9/27-point Galerkin coarse levels (a 3^ndim
        # stencil couples equal-parity cells only through the
        # diagonal, so the coloring always decouples). Each color
        # update is a masked pointwise-Jacobi step — pure VPU, no
        # triangular solves. The V-cycle stays exactly symmetric
        # because the post-smoother runs the ADJOINT sweep (reversed
        # color order); stronger per mat-vec than Richardson
        # (smoothing factor ~0.25 vs ~0.6 on the 5-point stencil).
        if smoother not in ("richardson", "gs"):
            raise ValueError(f"unknown smoother {smoother!r}")
        self.smoother = smoother
        # cycle='v' (default) or 'w': the W-cycle applies the coarse
        # correction TWICE per level (e <- e + M_c(r_c - A_c e)), i.e.
        # the symmetric iterated correction M_c(2I - A_c M_c) — still
        # an SPD preconditioner, sharper coarse solves for ~2x coarse
        # work (cheap: coarse levels are 4^-level the fine size in 2-D).
        # An F-cycle is deliberately NOT offered: its two coarse visits
        # use DIFFERENT operators (F then V), so M_F = M1 + M2 - M2 A
        # M1 is asymmetric and silently invalid inside CG.
        if cycle not in ("v", "w"):
            raise ValueError(
                f"unknown cycle {cycle!r} ('v' or 'w'; F-cycles are "
                "asymmetric and unusable as CG preconditioners)"
            )
        self.cycle = cycle
        if overcorrection is None:
            overcorrection = 1.8 if transfer == "aggregation" else 1.0
        if g**ndim != fine.shape[0]:
            raise ValueError(
                f"operator size {fine.shape[0]} is not a {g}^{ndim} grid"
            )
        self.ndim = int(ndim)
        if min_coarse_grid is None:
            # keep the coarsest level's dense solve cheap (<= ~4096
            # unknowns) while avoiding over-deep hierarchies; small
            # grids coarsen at least once
            min_coarse_grid = max(4, min(32 if ndim == 2 else 8, g // 2))
        if pre_smooth < 1 or post_smooth < 1:
            raise ValueError(
                "pre_smooth/post_smooth must be >= 1: the symmetric "
                "smoothing pair is what makes the V-cycle SPD"
            )
        self.g = g
        self.pre = int(pre_smooth)
        self.post = int(post_smooth)
        dtype = dtype or fine.dtype
        self.dtype = dtype
        build_bands = fine.bands  # pre-cast: the hierarchy builds in
        build_offsets = tuple(fine.offsets)  # the SOLVE precision
        if fine.dtype != dtype:
            # mixed mode: the V-cycle's OWN copy of the fine bands is
            # cast to the cycle dtype so the fine-level smoothing
            # mat-vecs — the dominant cost — actually run at fp32
            # (without this, dtype promotion silently ran them at
            # fp64, defeating apply_mixed's purpose)
            fine = DiaOperator(
                jnp.asarray(fine.bands, dtype), tuple(fine.offsets)
            )
        self.fine = fine

        # build the Galerkin hierarchy — every level stays banded, so
        # setup is O(nnz) per level and the device mat-vecs are all
        # VPU shift-AXPYs. Two builders (VERDICT r1 item 5):
        # 'device' = band-probing entirely on the accelerator (the
        # hierarchy never transits the host; only the coarsest level
        # is downloaded for its dense/Chebyshev solve), 'host' = the
        # NumPy bincount build; 'auto' picks device on an accelerator
        # backend for large fine levels.
        if galerkin_setup not in ("auto", "host", "device"):
            raise ValueError(f"unknown galerkin_setup {galerkin_setup!r}")
        if galerkin_setup == "auto":
            import jax

            use_device = (
                jax.default_backend() not in ("cpu",)
                and fine.shape[0] >= 1 << 18
            )
        else:
            use_device = galerkin_setup == "device"

        self.grids: List[int] = [g]
        # levels[k] = (bands, offsets) of coarse level k+1; bands are
        # device arrays on the device path, np.float64 on the host path
        levels: List = []
        if use_device:
            bands_cur = jnp.asarray(build_bands)
            offs_cur = build_offsets
            cur_g = g
            while cur_g % 2 == 0 and cur_g // 2 >= min_coarse_grid:
                bands_cur, offs_cur = galerkin_probe(
                    bands_cur, offs_cur, cur_g, ndim, transfer
                )
                cur_g //= 2
                self.grids.append(cur_g)
                levels.append((bands_cur, offs_cur))
        else:
            host_fine = DIAMatrix(
                fine.shape, build_offsets,
                np.asarray(build_bands, np.float64),
            )
            galerkin = (
                _galerkin_bilinear
                if transfer == "bilinear"
                else _galerkin_dia
            )
            cur = host_fine
            cur_g = g
            while cur_g % 2 == 0 and cur_g // 2 >= min_coarse_grid:
                cur = _galerkin_cached(galerkin, cur, cur_g, ndim)
                cur_g //= 2
                self.grids.append(cur_g)
                levels.append((cur.bands, tuple(cur.offsets)))
        if not levels:
            raise ValueError(
                f"grid {g} cannot be coarsened (need even g with "
                f"g/2 >= {min_coarse_grid})"
            )
        # the coarsest level's dense/Chebyshev solve happens on host
        # data — a tiny download on the device path
        cb, co = levels[-1]
        n_last = cb.shape[1]
        coarsest = DIAMatrix((n_last, n_last), co, np.asarray(cb, np.float64))

        self.omega = float(omega)
        self.overcorrection = float(overcorrection)

        def damp_of(bands, offsets):
            # float() of a device max is a scalar pull — O(1) traffic
            d0 = offsets.index(0)
            return jnp.asarray(
                self.omega / float(jnp.max(jnp.asarray(bands[d0]))), dtype
            )

        self.fine_damp = damp_of(build_bands, build_offsets)
        # coarse levels: all but the last smooth+recurse; last solves
        self.coarse_ops = [
            DiaOperator(jnp.asarray(b, dtype), offs)
            for b, offs in levels[:-1]
        ]
        self.coarse_damp = [damp_of(b, offs) for b, offs in levels[:-1]]

        # Gauss-Seidel setup: per smoothing level, the color masks and
        # the pointwise inverse diagonal
        self.colors: Optional[List[List[jnp.ndarray]]] = None
        self.dinv: Optional[List[jnp.ndarray]] = None
        if smoother == "gs":
            colors_all, dinv_all = [], []
            for lvl, (b, offs) in enumerate(
                [(build_bands, build_offsets)] + levels[:-1]
            ):
                masks = _color_masks(self.grids[lvl], ndim, offs)
                if masks is None:
                    raise ValueError(
                        "smoother='gs' needs grid-stencil levels "
                        f"(level {lvl} offsets {offs} do not decode "
                        f"on the {self.grids[lvl]}^{ndim} grid)"
                    )
                d0 = offs.index(0)
                dinv_all.append(
                    jnp.asarray(1.0 / jnp.asarray(b[d0]), dtype)
                )
                # stacked (ncolors, n): the sweeps fori_loop over colors
                # so the 27-color 3-D coarse levels don't unroll into a
                # huge graph
                colors_all.append(jnp.asarray(np.stack(masks), dtype))
            self.colors = colors_all
            self.dinv = dinv_all
        self._cheb_bands = None
        self._cheb_offsets = None
        self._cheb_lo = None
        self._cheb_hi = None
        if coarsest.shape[0] <= 4096:
            self.coarsest_inv = jnp.asarray(
                np.linalg.inv(coarsest.to_dense()), dtype
            )
            self.coarsest_cheb = None
        else:
            # an odd grid can stop coarsening while still large (e.g.
            # 1000 -> 500 -> 250 -> 125): a dense inverse would be
            # prohibitive, so solve the coarsest level approximately
            # with a fixed-degree Chebyshev polynomial — a LINEAR,
            # symmetric operator, so the V-cycle stays SPD
            from cgx.solver.chebyshev import host_spectral_bounds
            from cgx.solver.precond import chebyshev_banded

            self.coarsest_inv = None
            lo, hi = host_spectral_bounds(coarsest)
            lo = max(lo, 1e-12)
            # keep the closure's inputs as attributes so tree_unflatten
            # can rebuild it (closures don't flatten)
            self._cheb_bands = jnp.asarray(coarsest.bands, dtype)
            self._cheb_offsets = tuple(coarsest.offsets)
            self._cheb_lo = float(lo)
            self._cheb_hi = float(hi)
            self.coarsest_cheb = chebyshev_banded(
                self._cheb_bands,
                self._cheb_offsets,
                lo,
                hi,
                degree=_CHEB_DEGREE,
            )

    # --- grid transfer (reshape + pooling: pure layout/VPU work) -----

    @staticmethod
    def _restrict(r: jnp.ndarray, g: int, ndim: int = 2) -> jnp.ndarray:
        gc = g // 2
        shape = sum(((gc, 2) for _ in range(ndim)), ())
        axes = tuple(2 * i + 1 for i in range(ndim))
        return r.reshape(shape).mean(axis=axes).reshape(-1)

    @staticmethod
    def _prolong(e: jnp.ndarray, gc: int, ndim: int = 2) -> jnp.ndarray:
        # P = Agg^T: broadcast each coarse value to its 2^ndim cell
        a = e.reshape((gc,) * ndim)
        for axis in range(ndim):
            a = jnp.repeat(a, 2, axis=axis)
        return a.reshape(-1)

    # tensor-product 1-D (bi/tri)linear resampling per axis: fine 2i
    # gets .75 c_i + .25 c_{i-1}, fine 2i+1 gets .75 c_i + .25 c_{i+1}
    # (boundary neighbours are zero — Dirichlet exterior). Pure VPU
    # shifts/interleaves; the pair below are exact adjoints.

    @staticmethod
    def _up_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        a = jnp.moveaxis(a, axis, 0)
        zero = jnp.zeros_like(a[:1])
        am1 = jnp.concatenate([zero, a[:-1]], axis=0)
        ap1 = jnp.concatenate([a[1:], zero], axis=0)
        r0 = 0.75 * a + 0.25 * am1
        r1 = 0.75 * a + 0.25 * ap1
        out = jnp.stack([r0, r1], axis=1).reshape(
            (2 * a.shape[0],) + a.shape[1:]
        )
        return jnp.moveaxis(out, 0, axis)

    @staticmethod
    def _down_axis(a: jnp.ndarray, axis: int) -> jnp.ndarray:
        a = jnp.moveaxis(a, axis, 0)
        f0 = a[0::2]
        f1 = a[1::2]
        zero = jnp.zeros_like(f0[:1])
        f1m = jnp.concatenate([zero, f1[:-1]], axis=0)
        f0p = jnp.concatenate([f0[1:], zero], axis=0)
        out = 0.75 * (f0 + f1) + 0.25 * (f1m + f0p)
        return jnp.moveaxis(out, 0, axis)

    @staticmethod
    def _prolong_bilinear(
        e: jnp.ndarray, gc: int, ndim: int = 2
    ) -> jnp.ndarray:
        a = e.reshape((gc,) * ndim)
        for axis in range(ndim):
            a = MGPreconditioner._up_axis(a, axis)
        return a.reshape(-1)

    @staticmethod
    def _restrict_bilinear(
        r: jnp.ndarray, g: int, ndim: int = 2
    ) -> jnp.ndarray:
        a = r.reshape((g,) * ndim)
        for axis in range(ndim):
            a = MGPreconditioner._down_axis(a, axis)
        return a.reshape(-1)

    # --- V-cycle -----------------------------------------------------

    def _matvec(self, level: int, v: jnp.ndarray) -> jnp.ndarray:
        if level == 0:
            return banded_matvec(self.fine.bands, self.fine.offsets, v)
        op = self.coarse_ops[level - 1]
        return banded_matvec(op.bands, op.offsets, v)

    def _damp(self, level: int) -> jnp.ndarray:
        return self.fine_damp if level == 0 else self.coarse_damp[level - 1]

    def _vcycle(self, level: int, r: jnp.ndarray) -> jnp.ndarray:
        n_smooth_levels = 1 + len(self.coarse_ops)
        if level == n_smooth_levels:
            if self.coarsest_inv is not None:
                return jnp.matmul(
                    self.coarsest_inv, r,
                    precision=jax.lax.Precision.HIGHEST,
                )
            return self.coarsest_cheb(r)
        g = self.grids[level]
        if self.smoother == "gs":
            colors = self.colors[level]
            dinv = self.dinv[level]
            # first color update from z0 = 0 needs no mat-vec
            z = colors[0] * dinv * r
            z = self._gs_sweep(level, z, r, start=1)
            for _ in range(self.pre - 1):
                z = self._gs_sweep(level, z, r)
        else:
            damp = self._damp(level)
            z = damp * r  # first Richardson sweep from z0 = 0
            for _ in range(self.pre - 1):
                z = z + damp * (r - self._matvec(level, z))
        resid = r - self._matvec(level, z)
        if self.transfer == "bilinear":
            r_c = self._restrict_bilinear(resid, g, self.ndim)
        else:
            r_c = self._restrict(resid, g, self.ndim)
        e_c = self._vcycle(level + 1, r_c)
        if self.cycle == "w" and level + 1 < n_smooth_levels:
            # second, symmetric correction pass: e <- e + M_c(r_c -
            # A_c e) = M_c(2I - A_c M_c) r_c. Skipped on the coarsest
            # level, where the solve is already exact.
            e_c = e_c + self._vcycle(
                level + 1, r_c - self._matvec(level + 1, e_c)
            )
        if self.transfer == "bilinear":
            corr = self._prolong_bilinear(e_c, g // 2, self.ndim)
        else:
            corr = self._prolong(e_c, g // 2, self.ndim)
        z = z + self.overcorrection * corr
        if self.smoother == "gs":
            # adjoint sweep (reversed color order) keeps the V-cycle
            # exactly symmetric
            for _ in range(self.post):
                z = self._gs_sweep(level, z, r, reverse=True)
        else:
            for _ in range(self.post):
                z = z + damp * (r - self._matvec(level, z))
        return z

    def _gs_sweep(self, level, z, r, *, start=0, reverse=False):
        """One multicolor Gauss-Seidel sweep: per color, a masked
        pointwise-Jacobi update with the freshest z (fori_loop over the
        stacked masks — compile-time independent of the color count)."""
        import jax

        colors = self.colors[level]
        dinv = self.dinv[level]
        nc = colors.shape[0]

        def body(i, z):
            mask = colors[nc - 1 - i] if reverse else colors[i]
            return z + mask * dinv * (r - self._matvec(level, z))

        return jax.lax.fori_loop(start, nc, body, z)

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """z = M^{-1} r (one symmetric V-cycle from a zero guess)."""
        return self._vcycle(0, r)

    def apply_mixed(self, r: jnp.ndarray) -> jnp.ndarray:
        """z = M^{-1} r with the V-cycle run in the preconditioner's
        own dtype and the result cast back to r's dtype.

        Build with ``dtype=jnp.float32`` and use this inside an fp64
        CG: the smoother/transfers/coarse solves don't need fp64
        accuracy (the preconditioner only has to be a fixed SPD-ish
        linear map), so on TPU — where fp64 is emulated — the V-cycle
        cost drops to hardware-rate fp32 while iteration counts stay
        unchanged (measured identical at g=256 and N=1e6)."""
        return self._vcycle(0, r.astype(self.dtype)).astype(r.dtype)

    # --- pytree protocol ------------------------------------------------
    # Registering the preconditioner as a pytree lets callers pass it
    # THROUGH a jit boundary as an operand instead of capturing its
    # hierarchy as embedded constants. This matters operationally: on
    # the relay, compile requests carry the program (constants
    # included), and an N=1e7 hierarchy's ~120 MB of coarse bands blew
    # the body-size limit (HTTP 413, results/hw_queue_r3/
    # fp64q_g3200_tw.log). As an operand only the SHAPES enter the
    # program. See cgx.solver.refine's tree-precond plumbing.

    _AUX_FIELDS = (
        "transfer", "smoother", "cycle", "ndim", "g", "pre", "post",
        "omega", "overcorrection", "_cheb_offsets", "_cheb_lo",
        "_cheb_hi",
    )
    _CHILD_FIELDS = (
        "fine", "coarse_ops", "fine_damp", "coarse_damp",
        "coarsest_inv", "_cheb_bands", "colors", "dinv",
    )

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._CHILD_FIELDS)
        aux = (
            tuple(getattr(self, f) for f in self._AUX_FIELDS),
            tuple(self.grids),
            jnp.dtype(self.dtype).name,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        self = object.__new__(cls)
        fields, grids, dtype_name = aux
        for f, v in zip(cls._AUX_FIELDS, fields):
            setattr(self, f, v)
        self.grids = list(grids)
        self.dtype = jnp.dtype(dtype_name)
        for f, v in zip(cls._CHILD_FIELDS, children):
            setattr(self, f, v)
        if self._cheb_bands is not None:
            from cgx.solver.precond import chebyshev_banded

            self.coarsest_cheb = chebyshev_banded(
                self._cheb_bands, self._cheb_offsets, self._cheb_lo,
                self._cheb_hi, degree=_CHEB_DEGREE,
            )
        else:
            self.coarsest_cheb = None
        return self


jax.tree_util.register_pytree_node_class(MGPreconditioner)


def infer_grid_ndim(n: int, offsets) -> int:
    """Guess the grid dimension of a banded operator: the dimension
    whose grid side g (g^ndim = N) puts the widest stencil offset at
    ~g^(ndim-1) (2-D 5-point: +-g; 3-D 7-point: +-g^2). Ambiguous N
    (e.g. 4096 = 64^2 = 16^3) is resolved by that offset. Defaults to
    2 when nothing fits."""
    maxoff = max((abs(int(o)) for o in offsets), default=1) or 1
    best, best_score = 2, None
    for ndim in (2, 3):
        g = int(round(n ** (1.0 / ndim)))
        if g < 2 or g**ndim != n:
            continue
        score = abs(maxoff - g ** (ndim - 1))
        if best_score is None or score < best_score:
            best, best_score = ndim, score
    return best


def mg_preconditioner(
    mat,
    g: Optional[int] = None,
    *,
    ndim: int = 2,
    **kwargs,
) -> MGPreconditioner:
    """Build a V-cycle preconditioner for a grid Laplacian.

    Args:
      mat: host DIAMatrix or device DiaOperator on a g^ndim grid.
      g: grid side; inferred as N^(1/ndim) when omitted.
      ndim: grid dimension (2 for lap2d_fd, 3 for lap3d_fd).
    """
    op = DiaOperator.from_host(mat) if isinstance(mat, DIAMatrix) else mat
    if g is None:
        g = int(round(op.shape[0] ** (1.0 / ndim)))
    return MGPreconditioner(op, g, ndim=ndim, **kwargs)
