"""Conjugate-gradient core: a single jitted ``lax.while_loop``.

TPU-native re-design of the reference's CG iteration (MPI
``CGSolver::solve`` cg.cc:38-156, CUDA cg.cu:166-305). Where the
reference pays a host<->device round-trip per iteration (two cublasDdot
D2H copies + cudaDeviceSynchronize, cg.cu:245-260) or three MPI
collectives, here the *entire* solve — including the convergence test —
is one compiled XLA program: the scalar recurrence lives in the
``while_loop`` carry and never leaves the device.

Recurrence order matches the reference exactly (for trajectory parity):

    r = b - A x0 ; p = r ; rsold = <r, p>
    while k < maxiter:
        Ap    = A p
        conj  = <p, Ap>
        alpha = rsold / max(conj, rsold * NEARZERO)     # cg.cc:107
        x    += alpha p ; r -= alpha Ap
        rsnew = <r, r>
        if sqrt(rsnew) < tol: break                     # cg.cc:120 (abs!)
        p     = r + (rsnew / rsold) p
        rsold = rsnew ; k += 1

The reported iteration count ``k`` equals the 0-based index of the
converging iteration (or ``maxiter``), and on convergence ``rsold`` is
*not* updated — both matching the reference's for-loop-with-break so
that its DEBUG print ``[STEP k] residual = sqrt(rsold)`` reproduces
bit-for-bit (cg.cc:144-154).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from cgx.config import DEFAULT_TOLERANCE, NEARZERO
from cgx.ops.reduce import vdot


class CGResult(NamedTuple):
    """Structured solve record (SURVEY §5 'metrics' plan)."""

    x: jnp.ndarray
    iterations: jnp.ndarray  # int32: reference-parity k
    residual_norm: jnp.ndarray  # sqrt(rsnew) at exit (recursive residual)
    converged: jnp.ndarray  # bool
    rsold: jnp.ndarray  # for reference DEBUG-print parity: sqrt(rsold)
    history: jnp.ndarray  # (history_len,) residual-norm trace (nan-padded)
    # True if <p, Ap> <= 0 was ever observed: the matrix is not SPD and
    # CG theory no longer applies (the reference only clamps the alpha
    # denominator, cg.cc:107, and would silently return garbage —
    # SURVEY §5 'failure detection' row asks for this to be surfaced).
    breakdown: jnp.ndarray


def _as_matvec(a) -> Callable[[jnp.ndarray], jnp.ndarray]:
    if callable(a) and not hasattr(a, "matvec"):
        return a
    if hasattr(a, "matvec"):
        return a.matvec
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        return lambda x: a @ x
    raise TypeError(f"cannot interpret {type(a)} as a linear operator")


def cg_loop(
    operator_tree: Any,
    b: jnp.ndarray,
    x0: jnp.ndarray,
    tol: jnp.ndarray,
    nearzero: jnp.ndarray,
    *,
    maxiter: int,
    history: int,
    dot_precision,
    matvec,  # static callable taking (operator_tree, x)
    precond,  # static callable taking (operator_tree, r) or None
    dot=None,  # static callable <a,b> -> scalar; default local VPU vdot.
    #           The sharded path passes a psum-reducing dot so the same
    #           loop runs under shard_map (cgx/parallel/sharded_cg.py).
):
    if dot is None:
        dot = partial(vdot, precision=dot_precision)
    acc = b.dtype if dot_precision is None else jnp.dtype(dot_precision)

    def mv(p):
        return matvec(operator_tree, p)

    r = b - mv(x0)
    if precond is None:
        p = r
        rsold = dot(r, p)
        rr0 = rsold
    else:
        z = precond(operator_tree, r)
        p = z
        rsold = dot(r, z)
        # the pre-loop convergence test below must watch ||r||, not
        # sqrt(<r,z>) (the preconditioner scales the latter arbitrarily)
        rr0 = dot(r, r)

    hist0 = jnp.full((max(history, 1),), jnp.nan, dtype=acc)

    def cond(state):
        k, x, r, p, rsold, rsnew, converged, hist, breakdown = state
        return jnp.logical_and(k < maxiter, jnp.logical_not(converged))

    def body(state):
        k, x, r, p, rsold, rsnew_prev, _, hist, breakdown = state
        Ap = mv(p)
        conj = dot(p, Ap)
        breakdown = jnp.logical_or(breakdown, conj <= 0)
        alpha = (rsold / jnp.maximum(conj, rsold * nearzero)).astype(b.dtype)
        x = x + alpha * p
        r = r - alpha * Ap
        rr = dot(r, r)
        res = jnp.sqrt(rr)
        if history > 0:
            hist = hist.at[k].set(res, mode="drop")
        converged = res < tol
        if precond is None:
            rsnew = rr
            new_dir = r
        else:
            z = precond(operator_tree, r)
            rsnew = dot(r, z)
            new_dir = z
        beta = (rsnew / rsold).astype(b.dtype)
        p_next = new_dir + beta * p
        # On convergence the reference breaks *before* updating p/rsold/k.
        p = jnp.where(converged, p, p_next)
        rsold_next = jnp.where(converged, rsold, rsnew)
        k_next = jnp.where(converged, k, k + 1)
        return (k_next, x, r, p, rsold_next, rr, converged, hist, breakdown)

    # Pre-loop convergence: an exactly-zero initial residual would make
    # alpha = 0/0 = NaN inside the loop (the reference has the same
    # division, cg.cc:107, and would NaN too — we instead return x0).
    # A small-but-nonzero r below tol converges at k=0 either way, so
    # iteration counts are unaffected.
    pre_conv = jnp.logical_or(jnp.sqrt(rr0) < tol, rr0 == 0)
    state0 = (
        jnp.asarray(0, jnp.int32),
        x0,
        r,
        p,
        rsold,
        rr0,  # rsnew placeholder: <r,r> so residual_norm is right on
        # the pre-converged exit path even under a preconditioner
        pre_conv,
        hist0,
        jnp.asarray(False),
    )
    k, x, r, p, rsold, rsnew, converged, hist, breakdown = jax.lax.while_loop(
        cond, body, state0
    )
    return CGResult(
        x=x,
        iterations=k,
        residual_norm=jnp.sqrt(rsnew),
        converged=converged,
        rsold=rsold,
        history=hist if history > 0 else hist[:0],
        breakdown=breakdown,
    )


_cg_while = partial(
    jax.jit,
    static_argnames=("maxiter", "history", "dot_precision", "matvec", "precond"),
)(cg_loop)


def cg_solve(
    a,
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    *,
    tol: float = DEFAULT_TOLERANCE,
    maxiter: Optional[int] = None,
    nearzero: float = NEARZERO,
    history: int = 0,
    dot_precision=None,
    precond: Optional[Callable] = None,
) -> CGResult:
    """Solve ``A x = b`` by conjugate gradient on device.

    Args:
      a: a linear operator — anything with ``.matvec``, a 2-D array, or
        a callable ``x -> A x``.
      b: right-hand side.
      x0: initial guess (zeros by default, as the reference drivers do —
        cg_main.cc:49-50).
      tol: *absolute* residual tolerance ``sqrt(<r,r>) < tol``
        (reference parity; default 1e-10).
      maxiter: iteration cap; defaults to N (cg.cc:172 / cg.cu:236).
      nearzero: alpha-denominator clamp factor (cg.cc:8).
      history: length of the residual-trace buffer to record (static).
      dot_precision: optional dtype for scalar-reduction accumulation
        (mixed-precision mode: e.g. vectors f32, dots f64).
      precond: optional ``r -> M^{-1} r`` preconditioner apply (see
        cgx.solver.precond for Jacobi/SSOR constructors).
    """
    n = b.shape[0]
    if maxiter is None:
        maxiter = n
    if x0 is None:
        x0 = jnp.zeros_like(b)

    # Raw 2-D arrays become DenseOperator so the matrix travels as a
    # traced pytree leaf — a fresh closure per call would defeat the jit
    # cache (full recompile per solve, with A baked in as a constant).
    if isinstance(a, jnp.ndarray) and a.ndim == 2:
        from cgx.solver.operators import DenseOperator

        a = DenseOperator(a)

    # Grid-stencil operators: run the WHOLE loop in (g,)*ndim layout.
    # The grid mat-vec is ~8x faster than the flat one, but mixing a
    # grid-shaped mat-vec with flat vector updates costs a relayout
    # per iteration that eats the win (measured 213 us vs 130 us at
    # N=1e6 fp32); keeping every vector grid-shaped keeps the whole
    # iteration fused (97 us). The recurrence is shape-agnostic
    # (elementwise ops + vdot tree-sums over all axes).
    from cgx.solver.operators import GridDiaOperator, _GridView

    if isinstance(a, GridDiaOperator) and precond is None:
        shape = (a.g,) * a.ndim
        res = _cg_while(
            _GridView(a),
            b.reshape(shape),
            x0.reshape(shape),
            jnp.asarray(
                tol, b.dtype if dot_precision is None else dot_precision
            ),
            jnp.asarray(nearzero, b.dtype),
            maxiter=int(maxiter),
            history=int(history),
            dot_precision=dot_precision,
            matvec=_call_matvec,
            precond=None,
        )
        return res._replace(x=res.x.reshape(-1))
    mv = _as_matvec(a)
    # Pass the operator through as a pytree where possible so jit caches
    # on structure, not on array identity.
    if hasattr(a, "matvec"):
        tree = a
        static_mv = _call_matvec
    else:
        tree = None
        static_mv = _ClosureMatvec(mv)

    static_pc = None
    if precond is not None:
        static_pc, pstate = _resolve_tree_precond(precond)
        if pstate is not None and tree is not None:
            tree = _OpWithPrecondState(tree, pstate)
        elif pstate is not None:
            # raw-callable operator: no tree to ride — legacy closure
            static_pc = _ClosurePrecond(precond)

    return _cg_while(
        tree,
        b,
        x0,
        jnp.asarray(tol, b.dtype if dot_precision is None else dot_precision),
        jnp.asarray(nearzero, b.dtype),
        maxiter=int(maxiter),
        history=int(history),
        dot_precision=dot_precision,
        matvec=static_mv,
        precond=static_pc,
    )


def _call_matvec(tree, x):
    return tree.matvec(x)


@jax.tree_util.register_pytree_node_class
class _OpWithPrecondState:
    """Bundle (operator, preconditioner state) into ONE operand pytree.

    cg_loop's precond protocol is ``precond(operator_tree, r)`` exactly
    so preconditioner STATE can ride the jit arguments: a closure like
    ``mg.apply`` captures the whole MG hierarchy as embedded program
    constants, which (a) re-traces per instance and (b) ships the
    arrays inside the compile request — on the relay an N=1e7
    hierarchy's ~120 MB of coarse bands exceeded the compile-service
    body limit (HTTP 413, results/hw_queue_r3/fp64q_g3200_tw.log). As
    an operand, only shapes enter the program.
    """

    def __init__(self, op, pstate):
        self.op = op
        self.pstate = pstate

    def matvec(self, x):
        return self.op.matvec(x)

    def tree_flatten(self):
        return (self.op, self.pstate), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _pstate_apply(tree, r):
    return tree.pstate.apply(r)


def _pstate_apply_mixed(tree, r):
    return tree.pstate.apply_mixed(r)


_PSTATE_APPLIES = {"apply": _pstate_apply, "apply_mixed": _pstate_apply_mixed}


def _resolve_tree_precond(precond):
    """Split a preconditioner callable into (static_fn, state_operand).

    Bound ``apply``/``apply_mixed`` methods of pytree-registered
    preconditioners (e.g. MGPreconditioner) become a module-level
    static callable + the instance as an operand; anything else keeps
    the legacy hashable-closure path with no operand."""
    self_obj = getattr(precond, "__self__", None)
    name = getattr(precond, "__name__", None)
    if (
        self_obj is not None
        and hasattr(type(self_obj), "tree_flatten")
        and name in _PSTATE_APPLIES
    ):
        return _PSTATE_APPLIES[name], self_obj
    return _ClosurePrecond(precond), None


class _ClosureMatvec:
    """Hashable wrapper so raw-callable operators can be jit-static."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, tree, x):
        return self.fn(x)

    def __hash__(self):
        return hash(self.fn)

    def __eq__(self, other):
        return isinstance(other, _ClosureMatvec) and self.fn == other.fn


class _ClosurePrecond:
    def __init__(self, fn):
        self.fn = fn

    def __call__(self, tree, r):
        return self.fn(r)

    def __hash__(self):
        return hash(self.fn)

    def __eq__(self, other):
        return isinstance(other, _ClosurePrecond) and self.fn == other.fn
