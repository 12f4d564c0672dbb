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
    """Build the natural device operator for a host container."""
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
    raise TypeError(f"no operator mapping for {type(mat)}")
