"""Batched multi-RHS CG over a 2-D device mesh (rows x rhs).

The data-parallel axis the reference never had: a 2-D
``Mesh(('rows', 'rhs'))`` shards the matrix rows across one axis (the
reference's domain decomposition) and the right-hand sides across the
other (pure data parallelism — zero communication between rhs groups).
Per iteration the communication is exactly the 1-D row decomposition's
(halo exchange + per-rhs psum over 'rows'); the 'rhs' axis only joins
for the tiny convergence vote.

Each right-hand side converges independently (per-column freeze masks,
the same semantics vmap gives the single-device batched solver), and
the loop runs until every column on every shard is done.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.mats.containers import DIAMatrix
from cgx.parallel.partition import pad_bands, padded_size
from cgx.parallel.sharded_cg import _DiaHalo

ROWS, RHS = "rows", "rhs"


class _Dia2DAllGather:
    """Fallback matvec when the stencil bandwidth exceeds the row-shard
    size: all-gather p over the row axis, then window locally (the same
    fallback the 1-D path takes automatically)."""

    def __init__(self, offsets, n_loc: int):
        self.offsets = tuple(offsets)
        self.n_loc = n_loc

    def __call__(self, bands_loc, p_loc):
        import jax
        import jax.numpy as jnp

        p_full = jax.lax.all_gather(p_loc, ROWS, tiled=True)
        start = jax.lax.axis_index(ROWS) * self.n_loc
        pad = max(max(abs(o) for o in self.offsets), 1)
        p_pad = jnp.pad(p_full, ((pad, pad), (0, 0)))
        y = jnp.zeros_like(p_loc)
        for d, off in enumerate(self.offsets):
            sl = jax.lax.dynamic_slice_in_dim(
                p_pad, pad + start + off, self.n_loc, axis=0
            )
            y = y + bands_loc[d][:, None] * sl
        return y

    def __hash__(self):
        return hash((type(self), self.offsets, self.n_loc))

    def __eq__(self, other):
        return type(other) is type(self) and (
            other.offsets, other.n_loc
        ) == (self.offsets, self.n_loc)


def make_mesh2d(
    n_row_groups: int, n_rhs_groups: int, devices=None
) -> Mesh:
    """(rows x rhs) mesh over the first n_row_groups*n_rhs_groups devices."""
    if devices is None:
        devices = jax.devices()
    need = n_row_groups * n_rhs_groups
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_row_groups, n_rhs_groups)
    return Mesh(grid, (ROWS, RHS))


def _loop(bands_loc, B_loc, tol, nearzero, *, mv, maxiter: int):
    """Per-shard batched CG body (inside shard_map)."""
    dtype = B_loc.dtype

    def coldot(a, b):
        # per-rhs <a, b>: local column sums + psum over the row axis
        return jax.lax.psum(jnp.sum(a * b, axis=0), ROWS)

    X = jnp.zeros_like(B_loc)
    R = B_loc  # x0 = 0
    Pv = R
    rsold = coldot(R, R)
    pre_conv = jnp.logical_or(jnp.sqrt(rsold) < tol, rsold == 0)
    k0 = jnp.zeros(B_loc.shape[1], jnp.int32)
    brk0 = jnp.zeros(B_loc.shape[1], bool)

    def cond(state):
        k, X, R, Pv, rsold, rsnew, conv, brk = state
        # a column is live while unconverged AND under its budget —
        # counting only ~conv would spin forever once a column stalls
        # out at maxiter
        live = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
        n_active = jax.lax.psum(jnp.sum(live.astype(jnp.int32)), RHS)
        return n_active > 0

    def body(state):
        k, X, R, Pv, rsold, _, conv, brk = state
        active = jnp.logical_and(jnp.logical_not(conv), k < maxiter)
        AP = mv(bands_loc, Pv)
        conj = coldot(Pv, AP)
        # surface non-SPD breakdown per column (parity with every other
        # solver path) instead of silently clamping
        brk = jnp.logical_or(brk, jnp.logical_and(active, conj <= 0))
        alpha = rsold / jnp.maximum(conj, rsold * nearzero)
        alpha = jnp.where(active, alpha, 0.0).astype(dtype)  # freeze done cols
        X = X + alpha[None, :] * Pv
        R = R - alpha[None, :] * AP
        rsnew = coldot(R, R)
        conv_now = jnp.sqrt(rsnew) < tol
        adv = jnp.logical_and(active, jnp.logical_not(conv_now))
        beta = jnp.where(adv, rsnew / rsold, 0.0).astype(dtype)
        P_next = R + beta[None, :] * Pv
        Pv = jnp.where(adv[None, :], P_next, Pv)
        rsold = jnp.where(adv, rsnew, rsold)
        k = jnp.where(adv, k + 1, k)
        conv = jnp.logical_or(conv, jnp.logical_and(active, conv_now))
        return (k, X, R, Pv, rsold, rsnew, conv, brk)

    k, X, R, Pv, rsold, rsnew, conv, brk = jax.lax.while_loop(
        cond, body, (k0, X, R, Pv, rsold, rsold, pre_conv, brk0)
    )
    return X, k, jnp.sqrt(rsnew), conv, brk


def sharded_cg_solve_batched(
    mat: DIAMatrix,
    B: np.ndarray,
    *,
    mesh: Optional[Mesh] = None,
    row_groups: Optional[int] = None,
    rhs_groups: Optional[int] = None,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
):
    """Solve ``A X = B`` for many RHS over a (rows x rhs) mesh.

    Args:
      mat: banded host matrix.
      B: (nrhs, n) right-hand sides.
    Returns (X (nrhs, n), iterations (nrhs,), residual_norm (nrhs,),
    converged (nrhs,), breakdown (nrhs,)).
    """
    if mesh is None:
        mesh = make_mesh2d(row_groups or 1, rhs_groups or 1)
    pr = mesh.shape[ROWS]
    pc = mesh.shape[RHS]
    nrhs, n = B.shape
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, pr)
    r_pad = padded_size(nrhs, pc)

    B_np = np.asarray(B)
    # bands must match B's dtype or the while_loop carry types diverge
    bands = pad_bands(np.asarray(mat.bands, dtype=B_np.dtype), n_pad)
    B_pad = np.zeros((n_pad, r_pad), dtype=B_np.dtype)
    B_pad[:n, :nrhs] = B_np.T

    bands_dev = jax.device_put(bands, NamedSharding(mesh, P(None, ROWS)))
    B_dev = jax.device_put(B_pad, NamedSharding(mesh, P(ROWS, RHS)))

    n_loc = n_pad // pr
    halo = max(max(abs(o) for o in mat.offsets), 1)
    if halo <= n_loc:
        mv = _DiaHalo(ROWS, tuple(mat.offsets), n_loc, pr)
    else:
        # bandwidth exceeds the row shard: same auto-fallback as the
        # 1-D sharded solver
        mv = _Dia2DAllGather(mat.offsets, n_loc)

    fn = jax.jit(
        jax.shard_map(
            partial(_loop, mv=mv, maxiter=int(maxiter)),
            mesh=mesh,
            in_specs=(P(None, ROWS), P(ROWS, RHS), P(), P()),
            out_specs=(P(ROWS, RHS), P(RHS), P(RHS), P(RHS), P(RHS)),
            check_vma=False,
        )
    )
    X, k, res, conv, brk = fn(
        bands_dev,
        B_dev,
        jnp.asarray(tol, B_dev.dtype),
        jnp.asarray(nearzero, B_dev.dtype),
    )
    return X.T[:nrhs, :n], k[:nrhs], res[:nrhs], conv[:nrhs], brk[:nrhs]
