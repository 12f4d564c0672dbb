"""Checkpoint / resume for long CG solves (SURVEY §5: absent in the
reference — solver state lives only in RAM for one solve() call).

CG state is tiny (three vectors + two scalars), so checkpoints are
cheap ``.npz`` files; :func:`cg_solve_resumable` runs a solve in
segments, writing a checkpoint after each segment, and picks up from
the latest checkpoint on restart — the pattern that matters for very
large N or preemptible capacity. The warm restart is exact: the
recurrence continues from the saved (x, r, p, rsold), so a resumed
solve follows the same trajectory as an uninterrupted one.
"""

from __future__ import annotations

import dataclasses
import os
import tempfile
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops.reduce import vdot
from cgx.solver.cg import CGResult


@dataclasses.dataclass
class CGCheckpoint:
    """Resumable CG state: (x, r, p, rsold, k)."""

    x: np.ndarray
    r: np.ndarray
    p: np.ndarray
    rsold: float
    k: int

    def save(self, path) -> None:
        path = os.fspath(path)
        d = os.path.dirname(path) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp.npz")
        os.close(fd)
        try:
            with open(tmp, "wb") as f:
                np.savez(f, x=self.x, r=self.r, p=self.p,
                         rsold=self.rsold, k=self.k)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)

    @classmethod
    def load(cls, path) -> "CGCheckpoint":
        with np.load(path) as z:
            return cls(
                x=z["x"], r=z["r"], p=z["p"],
                rsold=float(z["rsold"]), k=int(z["k"]),
            )


def segment_loop(tree, x, r, p, rsold, tol, nz, *, budget: int,
                 matvec=None, dot=None):
    """`budget` reference-recurrence CG iterations from explicit state.

    ``matvec``/``dot`` default to the single-device operator protocol;
    the sharded resumable entry passes the strategy mat-vec and a
    psum-reducing dot so the same segment runs under shard_map."""
    if matvec is None:
        matvec = _op_matvec
    if dot is None:
        dot = vdot

    def cond(s):
        k, x, r, p, rsold, rsnew, conv, brk = s
        return jnp.logical_and(k < budget, jnp.logical_not(conv))

    def body(s):
        k, x, r, p, rsold, _, conv, brk = s
        ap = matvec(tree, p)
        conj = dot(p, ap)
        brk = jnp.logical_or(brk, conj <= 0)
        alpha = rsold / jnp.maximum(conj, rsold * nz)
        x = x + alpha * p
        r = r - alpha * ap
        rsnew = dot(r, r)
        conv = jnp.sqrt(rsnew) < tol
        p_next = r + (rsnew / rsold) * p
        p = jnp.where(conv, p, p_next)
        rsold_n = jnp.where(conv, rsold, rsnew)
        return (jnp.where(conv, k, k + 1), x, r, p, rsold_n, rsnew, conv, brk)

    # zero initial residual would NaN alpha inside the loop (see cg.py)
    pre_conv = jnp.logical_or(jnp.sqrt(rsold) < tol, rsold == 0)
    s0 = (
        jnp.asarray(0, jnp.int32), x, r, p, rsold, rsold,
        pre_conv, jnp.asarray(False),
    )
    return jax.lax.while_loop(cond, body, s0)


def _op_matvec(tree, x):
    return tree.matvec(x)


_segment = partial(
    jax.jit, static_argnames=("budget", "matvec", "dot")
)(segment_loop)


def cg_solve_resumable(
    op,
    b: jnp.ndarray,
    checkpoint_path,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    segment: int = 100,
) -> CGResult:
    """CG with periodic checkpointing.

    Runs in ``segment``-iteration slices; after each slice the state is
    written atomically to ``checkpoint_path``. If the file exists at
    entry, the solve resumes from it.
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    tol_ = jnp.asarray(tol, b.dtype)
    nz_ = jnp.asarray(nearzero, b.dtype)

    if os.path.exists(checkpoint_path):
        ck = CGCheckpoint.load(checkpoint_path)
        x = jnp.asarray(ck.x, b.dtype)
        r = jnp.asarray(ck.r, b.dtype)
        p = jnp.asarray(ck.p, b.dtype)
        rsold = jnp.asarray(ck.rsold, b.dtype)
        total_k = ck.k
    else:
        x = jnp.zeros_like(b)
        r = b - op.matvec(x)
        p = r
        rsold = vdot(r, p)
        total_k = 0

    conv = jnp.asarray(False)
    brk = jnp.asarray(False)
    rsnew = rsold
    while total_k < maxiter and not bool(conv):
        budget = min(segment, maxiter - total_k)
        k, x, r, p, rsold, rsnew, conv, brk_s = _segment(
            op, x, r, p, rsold, tol_, nz_, budget=int(budget)
        )
        brk = jnp.logical_or(brk, brk_s)
        total_k += int(k)
        CGCheckpoint(
            x=np.asarray(x), r=np.asarray(r), p=np.asarray(p),
            rsold=float(rsold), k=total_k,
        ).save(checkpoint_path)

    return CGResult(
        x=x,
        iterations=jnp.asarray(total_k, jnp.int32),
        residual_norm=jnp.sqrt(rsnew),
        converged=conv,
        rsold=rsold,
        history=jnp.zeros((0,), b.dtype),
        breakdown=brk,
    )


def sharded_cg_solve_resumable(
    mat,
    b,
    checkpoint_path,
    *,
    mesh=None,
    n_devices: Optional[int] = None,
    strategy: str = "auto",
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    segment: int = 100,
) -> CGResult:
    """Row-block-sharded CG with periodic checkpointing.

    Same segment/restart semantics as :func:`cg_solve_resumable`, but
    each segment is one shard_map program over the mesh (2 psum + 1
    gather-strategy mat-vec per iteration, exactly like
    :func:`cgx.parallel.sharded_cg.sharded_cg_solve`).

    Checkpoints store the GLOBAL (un-padded) vectors in the same
    ``CGCheckpoint`` npz format as the single-device solver, so a solve
    may be checkpointed on one mesh size and resumed on another — or
    moved between sharded and single-device execution — and continue
    on the identical trajectory.
    """
    from jax.sharding import PartitionSpec as P

    from cgx.parallel import sharded_cg as sc
    from cgx.parallel.mesh import ROWS_AXIS, make_mesh
    from cgx.parallel.partition import pad_vector, padded_size

    axis_name = ROWS_AXIS
    if mesh is None:
        mesh = make_mesh(n_devices, axis_name=axis_name)
    psize = mesh.devices.size
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    n_pad = padded_size(n, psize)
    n_loc = n_pad // psize

    b_np = np.asarray(b)
    b_dev = sc._put(pad_vector(b_np, n_pad), mesh, P(axis_name))
    dtype = b_dev.dtype
    mat, op_dev, mv, _diag = sc._build_op(
        mat, n, n_pad, n_loc, psize, dtype, mesh, strategy, axis_name
    )
    op_spec = sc._op_spec(mat, axis_name)
    dot = sc._PsumDot(axis_name, None)

    def _vec(host_vec):
        return sc._put(pad_vector(np.asarray(host_vec, dtype), n_pad),
                       mesh, P(axis_name))

    if os.path.exists(checkpoint_path):
        ck = CGCheckpoint.load(checkpoint_path)
        if ck.x.shape[0] != n:
            raise ValueError(
                f"checkpoint is for N={ck.x.shape[0]}, problem has N={n}"
            )
        x, r, p = _vec(ck.x), _vec(ck.r), _vec(ck.p)
        rsold = jnp.asarray(ck.rsold, dtype)
        total_k = ck.k
    else:
        # x0 = 0 (reference drivers): r = b, p = b, rsold = <b, b>
        x = _vec(np.zeros(n))
        r, p = b_dev, b_dev
        rsold = jnp.sum(b_dev * b_dev)  # global dot: XLA inserts the collective
        total_k = 0

    tol_ = jnp.asarray(tol, dtype)
    nz_ = jnp.asarray(nearzero, dtype)

    # memoize per budget (at most two distinct values: `segment` and
    # the final remainder) — a fresh jit(shard_map(partial(...))) per
    # loop pass would re-trace and re-compile EVERY segment
    seg_cache: dict = {}

    def _seg_fn(budget: int):
        if budget not in seg_cache:
            seg_cache[budget] = jax.jit(
                jax.shard_map(
                    partial(segment_loop, budget=budget, matvec=mv, dot=dot),
                    mesh=mesh,
                    in_specs=(op_spec, P(axis_name), P(axis_name),
                              P(axis_name), P(), P(), P()),
                    out_specs=(P(), P(axis_name), P(axis_name), P(axis_name),
                               P(), P(), P(), P()),
                    check_vma=False,
                )
            )
        return seg_cache[budget]

    conv = jnp.asarray(False)
    brk = jnp.asarray(False)
    rsnew = rsold
    while total_k < maxiter and not bool(conv):
        budget = min(segment, maxiter - total_k)
        k, x, r, p, rsold, rsnew, conv, brk_s = _seg_fn(int(budget))(
            op_dev, x, r, p, rsold, tol_, nz_
        )
        brk = jnp.logical_or(brk, brk_s)
        total_k += int(k)
        CGCheckpoint(
            x=np.asarray(x)[:n], r=np.asarray(r)[:n], p=np.asarray(p)[:n],
            rsold=float(rsold), k=total_k,
        ).save(checkpoint_path)

    return CGResult(
        x=x[:n],
        iterations=jnp.asarray(total_k, jnp.int32),
        residual_norm=jnp.sqrt(rsnew),
        converged=conv,
        rsold=rsold,
        history=jnp.zeros((0,), dtype),
        breakdown=brk,
    )
