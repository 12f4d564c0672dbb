"""Device-side linear operators.

Each operator is a JAX pytree wrapping device arrays plus static
metadata, exposing ``matvec(x)`` and ``diagonal()``. They are the
TPU-native re-design of the reference's L1/L2 pairing (dense Matrix +
cblas_dgemv / CUDA MatVec kernels):

- :class:`DenseOperator` — ``A @ x`` on the MXU. The 2-D grid tiling of
  the reference's CUDA kernels (MatVec cg.cu:14-61 / MatVecT
  cg.cu:63-110) is what XLA's tiler does natively; a hand-written
  Pallas variant lives in cgx/ops/matvec.py.
- :class:`DiaOperator` — banded SpMV as static shifted AXPYs on the VPU
  (no gathers/atomics; the analogue of the coalesced MatVecT concern is
  the lane-aligned streaming layout XLA picks for us).
- :class:`EllOperator` — gather + multiply-reduce over (N, K) planes.
- :class:`CsrOperator` — segment-sum SpMV (interop path; irregular
  shapes make it the least TPU-friendly format — prefer ELL/DIA).

All operators work under jit/vmap/shard_map because they are pytrees
with only array leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cgx.mats.containers import (
    COOMatrix,
    CSRMatrix,
    DenseMatrix,
    DIAMatrix,
    ELLMatrix,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenseOperator:
    """Dense symmetric operator: matvec on the MXU."""

    a: jnp.ndarray  # (n, n)

    @property
    def shape(self) -> Tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.a @ x

    def diagonal(self) -> jnp.ndarray:
        return jnp.diagonal(self.a)

    def tree_flatten(self):
        return (self.a,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_host(cls, mat, dtype=None) -> "DenseOperator":
        if isinstance(mat, DenseMatrix):
            a = mat.a
        elif isinstance(mat, np.ndarray):
            a = mat
        elif isinstance(mat, (COOMatrix, DIAMatrix)):
            a = mat.to_dense()
        else:
            raise TypeError(f"cannot build DenseOperator from {type(mat)}")
        return cls(jnp.asarray(a, dtype=dtype))


@jax.tree_util.register_pytree_node_class
class _GridView:
    """Adapter exposing matvec_grid as .matvec for grid-shaped loops."""

    def __init__(self, op: "GridDiaOperator"):
        self.op = op

    def matvec(self, xg: jnp.ndarray) -> jnp.ndarray:
        return self.op.matvec_grid(xg)

    def diagonal(self) -> jnp.ndarray:
        return self.op.diagonal()

    def tree_flatten(self):
        return (self.op,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])


def densify_on_device(op: "DiaOperator", dtype=None) -> "DenseOperator":
    """Materialize a banded operator as a dense (n, n) array ON the
    accelerator.

    Uploading a host-densified matrix moves O(n^2) bytes through the
    host link (~800 MB for the N=1e4 fp64 flagship — tens of minutes
    on a relay-tunneled chip); the bands are O(ndiag * n) (~400 KB),
    and the densification is a handful of jnp.diag adds the device
    does in milliseconds.
    """
    bands = op.bands if dtype is None else op.bands.astype(dtype)
    n = bands.shape[1]

    @jax.jit
    def build(bands):
        a = jnp.zeros((n, n), bands.dtype)
        for d, off in enumerate(op.offsets):
            lo, hi = max(0, -off), min(n, n - off)
            a = a + jnp.diag(bands[d, lo:hi], k=off)
        return a

    return DenseOperator(build(bands))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class PallasDenseOperator:
    """Dense operator through the tiled Pallas mat-vec kernel.

    A pytree whose leaf is the matrix and whose tile sizes are static
    aux data. This — not a closure — is how the Pallas kernel must
    enter a jitted solve: a lambda capturing the device matrix turns
    it into a jaxpr CONSTANT, and on relay-compiled backends the
    whole (possibly multi-GB) array is then serialized into the
    compile request (observed as HTTP 413 / endless-upload hangs on
    the tunneled v5e). As an operator argument it stays a runtime
    buffer. The CLI's CUDA-grammar Pallas path and the bench dense
    candidates route through this class.
    """

    a: jnp.ndarray  # (n, n)
    block_rows: int = 256
    block_cols: int = 512

    @property
    def shape(self) -> Tuple[int, int]:
        return self.a.shape

    @property
    def dtype(self):
        return self.a.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        from cgx.ops.matvec import dense_matvec

        return dense_matvec(
            self.a,
            x,
            block_rows=self.block_rows,
            block_cols=self.block_cols,
            interpret=jax.default_backend() == "cpu",
        )

    def diagonal(self) -> jnp.ndarray:
        return jnp.diagonal(self.a)

    def tree_flatten(self):
        return (self.a,), (self.block_rows, self.block_cols)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def banded_matvec(
    bands: jnp.ndarray, offsets: Tuple[int, ...], x: jnp.ndarray
) -> jnp.ndarray:
    """y = A x for banded A given as (ndiag, n) bands + static offsets.

    The one shared implementation of the shifted-AXPY banded mat-vec
    (used by DiaOperator, the Neumann preconditioner, and kernel
    initialisation — keep boundary/padding semantics in one place)."""
    n = bands.shape[1]
    pad = max(max(abs(o) for o in offsets), 1)
    xp = jnp.pad(x, (pad, pad))
    y = jnp.zeros_like(x)
    for d, off in enumerate(offsets):
        shifted = jax.lax.dynamic_slice(xp, (pad + off,), (n,))
        y = y + bands[d] * shifted
    return y


def banded_matvec_blocked(
    bands: jnp.ndarray,
    offsets: Tuple[int, ...],
    x: jnp.ndarray,
    block: int = 262144,
) -> jnp.ndarray:
    """Blocked shifted-AXPY banded mat-vec for x too large to keep
    on-chip.

    The flat :func:`banded_matvec` is the champion while XLA can hold
    x (or the fused padded copies) in VMEM; above that the fused
    elementwise pass re-streams the O(ndiag * n) shifted reads of x
    from HBM and throughput collapses (measured 73% -> 28-30% of HBM
    peak between N=1e6 and N=4e6..1e7 fp32, scripts/cliff_probe.py).
    This variant runs a ``lax.map`` (sequential scan) over row blocks:
    each step reads one halo'd x window + one bands block and writes
    one y block, so HBM traffic is the DIA speed of light
    ``(ndiag + 2) * n`` words + a 2*pad/block halo surcharge, and the
    per-block working set (~(ndiag + 4) * block words) stays VMEM-
    sized regardless of n.
    """
    ndiag, n = bands.shape
    pad = max(max(abs(o) for o in offsets), 1)
    nb = -(-n // block)
    n_p = nb * block
    xp = jnp.pad(x, (pad, pad + (n_p - n)))
    bands_p = jnp.pad(bands, ((0, 0), (0, n_p - n)))

    def blk(j):
        start = j * block
        w = jax.lax.dynamic_slice(xp, (start,), (block + 2 * pad,))
        bb = jax.lax.dynamic_slice(bands_p, (0, start), (ndiag, block))
        acc = bb[0] * jax.lax.dynamic_slice(w, (pad + offsets[0],), (block,))
        for d, off in enumerate(offsets[1:], start=1):
            acc += bb[d] * jax.lax.dynamic_slice(w, (pad + off,), (block,))
        return acc

    y = jax.lax.map(blk, jnp.arange(nb))
    return y.reshape(-1)[:n]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DiaOperator:
    """Banded operator: ``y = sum_d bands[d] * shift(x, offsets[d])``.

    ``offsets`` is static (part of the pytree aux data) so the shifts
    compile to static slices of a zero-padded x — XLA fuses the whole
    SpMV into one VPU pass over ``bands``.
    """

    bands: jnp.ndarray  # (ndiag, n)
    offsets: Tuple[int, ...] = dataclasses.field(default=())

    @property
    def shape(self) -> Tuple[int, int]:
        n = self.bands.shape[1]
        return (n, n)

    @property
    def dtype(self):
        return self.bands.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return banded_matvec(self.bands, self.offsets, x)

    def diagonal(self) -> jnp.ndarray:
        d = self.offsets.index(0)
        return self.bands[d]

    def tree_flatten(self):
        return (self.bands,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @classmethod
    def from_host(cls, mat: DIAMatrix, dtype=None) -> "DiaOperator":
        return cls(jnp.asarray(mat.bands, dtype=dtype), tuple(mat.offsets))


def _decode_grid_offsets(offsets, g: int, ndim: int, max_reach: int = 8):
    """Flat DIA offsets -> per-axis deltas on a row-major g^ndim grid
    (slowest axis first, matching the matvec's reshape), or None."""
    out = []
    for o in offsets:
        o = int(o)
        coords = []
        rem = o
        # peel from the SLOWEST axis (stride g^(ndim-1)) down
        for axis in range(ndim - 1, 0, -1):
            step = g**axis
            d = int(round(rem / step))
            if abs(d) > max_reach:
                return None
            coords.append(d)
            rem -= d * step
        if abs(rem) > max_reach:
            return None
        coords.append(rem)
        out.append(tuple(coords))
    return out


def _wrap_positions_zero(bands: np.ndarray, offsets, deltas, g: int, ndim: int) -> bool:
    """True iff every band value at a flat position whose grid decode
    would WRAP (per-axis coordinate leaves [0, g)) is exactly zero —
    the condition under which per-axis shifts reproduce the flat
    banded mat-vec bit for bit."""
    n = g**ndim
    idx = np.arange(n)
    coords = []
    rem = idx
    for axis in range(ndim):
        step = g ** (ndim - 1 - axis)
        coords.append(rem // step)
        rem = rem % step
    bands = np.asarray(bands)
    for k, (off, delta) in enumerate(zip(offsets, deltas)):
        lo, hi = max(0, -int(off)), min(n, n - int(off))
        rows = idx[lo:hi]
        ok = np.ones(hi - lo, bool)
        for axis in range(ndim):
            c = coords[axis][lo:hi] + delta[axis]
            ok &= (c >= 0) & (c < g)
        wrap = ~ok
        if wrap.any() and np.any(bands[k, rows[wrap]] != 0.0):
            return False
    return True


def _axis_shift(a: jnp.ndarray, axis: int, d: int) -> jnp.ndarray:
    """shifted[c] = a[c + d] along one axis, zero (Dirichlet) fill."""
    if d == 0:
        return a
    a = jnp.moveaxis(a, axis, 0)
    zero = jnp.zeros((abs(d),) + a.shape[1:], a.dtype)
    if d > 0:
        out = jnp.concatenate([a[d:], zero], axis=0)
    else:
        out = jnp.concatenate([zero, a[:d]], axis=0)
    return jnp.moveaxis(out, 0, axis)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class GridDiaOperator(DiaOperator):
    """Banded grid-stencil operator with GRID-AWARE shifts.

    Subclasses :class:`DiaOperator` (same ``bands``/``offsets``
    surface, so every isinstance gate and banded preconditioner
    constructor keeps working) and overrides only the mat-vec.

    Measured on the v5e: in an ISOLATED mat-vec loop the grid
    formulation wins 8-10x (28.7 vs 227 us at N=1e6 fp32 — per-axis
    static shifts fuse into one VMEM-tiled pass, no length-N pad or
    dynamic slices), but inside the FULL CG recurrence it loses to
    the flat operator (167 vs 130 us/iter at N=1e6; 4.2 vs 3.0 ms at
    N=1e7) — XLA fuses the flat matvec+recurrence body better than
    the grid-shaped one. cg_solve therefore keeps every vector
    grid-shaped when handed this operator (avoiding a worse
    relayout-per-iteration mix, 213 us), but as_operator still
    defaults to the flat path; this class is the documented starting
    point for a future Mosaic fused-iteration kernel.

    Exactness: per-axis shifts zero the cross-row neighbours, which
    equals the flat banded product iff every band value at a
    would-wrap flat position is zero — true for the lap2d_fd /
    lap3d_fd families and every Galerkin coarse level, FALSE for
    lap2d_reference's quasi-stencil (its +-1 band genuinely wraps).
    ``from_host`` verifies the condition and refuses otherwise; use
    :func:`as_operator`, which auto-detects and falls back to the
    flat :class:`DiaOperator`.
    """

    g: int = 0
    ndim: int = 2
    deltas: Tuple[Tuple[int, ...], ...] = dataclasses.field(default=())

    def matvec_grid(self, a: jnp.ndarray) -> jnp.ndarray:
        """y = A x with x/y in (g,)*ndim layout — the fusion-friendly
        form; solvers that keep their whole state grid-shaped avoid a
        per-iteration relayout (cg_solve does this automatically)."""
        shape = (self.g,) * self.ndim
        y = jnp.zeros(shape, a.dtype)
        for k, delta in enumerate(self.deltas):
            s = a
            for axis, d in enumerate(delta):
                s = _axis_shift(s, axis, d)
            y = y + self.bands[k].reshape(shape) * s
        return y

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = (self.g,) * self.ndim
        return self.matvec_grid(x.reshape(shape)).reshape(-1)

    def tree_flatten(self):
        return (self.bands,), (self.offsets, self.g, self.ndim, self.deltas)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def from_host(
        cls, mat: "DIAMatrix", dtype=None, *, g=None, ndim=None
    ) -> "GridDiaOperator":
        n = mat.shape[0]
        if ndim is None:
            for nd in (2, 3):
                s = round(n ** (1.0 / nd))
                if s**nd == n and _decode_grid_offsets(mat.offsets, s, nd):
                    ndim = nd
                    g = s
                    break
            else:
                raise ValueError(
                    f"offsets {mat.offsets} do not decode on a square/"
                    f"cubic grid of {n} points"
                )
        if g is None:
            g = round(n ** (1.0 / ndim))
        deltas = _decode_grid_offsets(mat.offsets, g, ndim)
        if deltas is None:
            raise ValueError(
                f"offsets {mat.offsets} do not decode on the {g}^{ndim} grid"
            )
        if not _wrap_positions_zero(mat.bands, mat.offsets, deltas, g, ndim):
            raise ValueError(
                "band values at wrapping flat positions are nonzero "
                "(e.g. lap2d_reference's quasi-stencil) — the grid "
                "shifts would change the product; use DiaOperator"
            )
        return cls(
            jnp.asarray(mat.bands, dtype=dtype),
            tuple(int(o) for o in mat.offsets),
            int(g),
            int(ndim),
            tuple(tuple(int(d) for d in dd) for dd in deltas),
        )



@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EllOperator:
    """ELLPACK operator: gather + VPU multiply-reduce over (n, K)."""

    values: jnp.ndarray  # (n, K)
    indices: jnp.ndarray  # int32 (n, K)

    @property
    def shape(self) -> Tuple[int, int]:
        n = self.values.shape[0]
        return (n, n)

    @property
    def dtype(self):
        return self.values.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        gathered = jnp.take(x, self.indices, axis=0)  # (n, K)
        return jnp.sum(self.values * gathered, axis=1)

    def diagonal(self) -> jnp.ndarray:
        n = self.values.shape[0]
        rows = jnp.arange(n, dtype=self.indices.dtype)[:, None]
        mask = self.indices == rows
        return jnp.sum(jnp.where(mask, self.values, 0.0), axis=1)

    def tree_flatten(self):
        return (self.values, self.indices), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_host(cls, mat: ELLMatrix, dtype=None) -> "EllOperator":
        return cls(jnp.asarray(mat.values, dtype=dtype), jnp.asarray(mat.indices))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CsrOperator:
    """CSR operator via expanded row ids + segment_sum (static nnz)."""

    values: jnp.ndarray  # (nnz,)
    indices: jnp.ndarray  # int32 (nnz,) column ids
    row_ids: jnp.ndarray  # int32 (nnz,) expanded row ids
    n: int = 0

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.values.dtype

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        prod = self.values * jnp.take(x, self.indices, axis=0)
        return jax.ops.segment_sum(prod, self.row_ids, num_segments=self.n)

    def diagonal(self) -> jnp.ndarray:
        on_diag = self.indices == self.row_ids
        return jax.ops.segment_sum(
            jnp.where(on_diag, self.values, 0.0), self.row_ids, num_segments=self.n
        )

    def tree_flatten(self):
        return (self.values, self.indices, self.row_ids), self.n

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, n=aux)

    @classmethod
    def from_host(cls, mat: CSRMatrix, dtype=None) -> "CsrOperator":
        lengths = np.diff(mat.indptr)
        row_ids = np.repeat(np.arange(mat.shape[0]), lengths).astype(np.int32)
        return cls(
            jnp.asarray(mat.values, dtype=dtype),
            jnp.asarray(mat.indices),
            jnp.asarray(row_ids),
            n=mat.shape[0],
        )


def as_operator(mat, dtype=None):
    """Build the natural device operator for a host container.

    Banded matrices get the flat :class:`DiaOperator`: its fully-fused
    while_loop iteration measured FASTER end-to-end than the
    grid-shifted :class:`GridDiaOperator` on the v5e (130 vs 167 us at
    N=1e6 fp32) even though the grid mat-vec wins isolated
    microbenchmarks 8x — construct GridDiaOperator explicitly to
    experiment.
    """
    if isinstance(mat, DIAMatrix):
        return DiaOperator.from_host(mat, dtype=dtype)
    if isinstance(mat, ELLMatrix):
        return EllOperator.from_host(mat, dtype=dtype)
    if isinstance(mat, CSRMatrix):
        return CsrOperator.from_host(mat, dtype=dtype)
    if isinstance(mat, (DenseMatrix, np.ndarray)):
        return DenseOperator.from_host(mat, dtype=dtype)
    if isinstance(mat, COOMatrix):
        return CsrOperator.from_host(CSRMatrix.from_coo(mat), dtype=dtype)
    if isinstance(mat, jnp.ndarray) and mat.ndim == 2:
        return DenseOperator(mat if dtype is None else mat.astype(dtype))
    # scipy.sparse interop: any scipy matrix converts via COO -> CSR
    # (duck-typed on tocoo so all scipy formats and both the matrix
    # and array APIs work without importing scipy here)
    if hasattr(mat, "tocoo") and hasattr(mat, "shape"):
        from cgx.mats.containers import COOMatrix as _COO

        coo = _COO.from_scipy(mat)
        return CsrOperator.from_host(CSRMatrix.from_coo(coo), dtype=dtype)
    raise TypeError(f"no operator mapping for {type(mat)}")
