"""Collective-op signature extraction for regression tests.

The framework's central communication claims — "2 psum + 1 all_gather
per iteration" for reference-parity CG (comm parity with
/root/reference/code/MPI/cg.cc:106,117,135), "ONE fused psum per
iteration" for pipelined CG, "zero per-iteration reductions" for
Chebyshev, "one Gram psum per s iterations" for s-step — live in
docstrings. This module turns them into assertable facts: it walks the
jaxpr of a jitted solve, records every collective primitive, and
reports them per *region* (setup vs. loop body) as fused groups.

Fused groups model XLA's all-reduce combiner: a ``lax.psum`` of a
tuple traces to several single-operand ``psum`` eqns, and the combiner
merges any all-reduces with no data dependence between them into one
launch. A reduction eqn therefore joins the most recent reduction
group in the same region iff its inputs do not (transitively) depend
on that group's outputs; claims about "one fused reduction" assert
group count 1 with the documented width. A refactor that chains two
reductions (e.g. the second dot needing the first's result) or adds a
brand-new one changes the signature and fails the test. The 2 psums of
reference CG stay 2 groups precisely because rsnew's dot depends on
alpha, which depends on the conj dot.
"""

from __future__ import annotations

import itertools
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# Primitive names that move data across mesh axes. `psum_invariant` is
# what shard_map emits under varying-manual-axes tracking; plain `psum`
# appears with check_vma=False on older paths. pbroadcast/pvary are
# VMA bookkeeping, not communication, and are excluded.
REDUCTIONS = ("psum", "psum_invariant", "psum2")
OTHER_COLLECTIVES = (
    "all_gather",
    "ppermute",
    "all_to_all",
    "reduce_scatter",
)
COLLECTIVES = REDUCTIONS + OTHER_COLLECTIVES

# Loop-entering primitives: their body executes once per iteration.
_LOOPS = ("while", "scan")


def _subjaxprs(eqn):
    for v in eqn.params.values():
        for item in v if isinstance(v, (list, tuple)) else [v]:
            if hasattr(item, "eqns"):  # raw Jaxpr (e.g. shard_map)
                yield item
            elif hasattr(item, "jaxpr") and hasattr(item.jaxpr, "eqns"):
                yield item.jaxpr  # ClosedJaxpr


def _canon(name: str) -> str:
    return "psum" if name in REDUCTIONS else name


class _Group:
    __slots__ = ("depth", "prim", "width", "gid", "elems")

    def __init__(self, depth, prim, width, gid, elems):
        self.depth = depth
        self.prim = prim
        self.width = width
        self.gid = gid
        self.elems = elems


def _collect(
    jaxpr, depth: int, out: List[_Group], gids, in_cond: bool = False
) -> None:
    """Walk one jaxpr region, appending collective groups in program
    order. Within the region, a reduction eqn merges into the most
    recent reduction group it does not transitively depend on (the
    all-reduce-combiner legality rule). Collectives inside a
    ``lax.cond`` branch — which launch only when the (replicated)
    predicate fires, e.g. Chebyshev's every-check_every convergence
    reduction — are suffixed ``[cond]`` and never merge with
    unconditional groups."""
    dep: Dict[Any, frozenset] = {}  # var -> psum-group gids it depends on
    last_psum: _Group = None
    for eqn in jaxpr.eqns:
        in_deps = frozenset()
        for v in eqn.invars:
            if isinstance(v, jax.extend.core.Literal):
                continue
            s = dep.get(v)
            if s:
                in_deps |= s
        name = eqn.primitive.name
        out_deps = in_deps
        if name in COLLECTIVES:
            prim = _canon(name)
            if in_cond:
                prim += "[cond]"
            elems = sum(
                int(np.prod(v.aval.shape)) for v in eqn.outvars
            )
            if (
                prim == "psum"
                and last_psum is not None
                and last_psum.gid not in in_deps
            ):
                last_psum.width += 1
                last_psum.elems += elems
                gid = last_psum.gid
            else:
                gid = next(gids)
                grp = _Group(depth, prim, 1, gid, elems)
                out.append(grp)
                if prim == "psum":
                    last_psum = grp
            if prim.startswith("psum"):
                out_deps = in_deps | {gid}
        for v in eqn.outvars:
            dep[v] = out_deps
        bump = 1 if name in _LOOPS else 0
        sub_cond = in_cond or name == "cond"
        for sub in _subjaxprs(eqn):
            _collect(sub, depth + bump, out, gids, sub_cond)


def _fmt(groups: List[_Group]) -> List[Tuple[str, int, int]]:
    """(primitive, fused-op count, total elements moved per launch)."""
    return [(g.prim, g.width, g.elems) for g in groups]


def collective_signature(fn, *args, **kwargs) -> Dict[str, Any]:
    """Trace ``fn(*args, **kwargs)`` and return its collective
    signature::

        {"setup": [(prim, width, elems), ...],   # outside any loop
         "iter":  [(prim, width, elems), ...],   # in while/scan bodies
         "by_depth": {depth: [(prim, width, elems), ...]}}

    Entries are ``(prim, width, elems)`` in program order: ``prim`` is
    'psum' (any all-reduce), 'all_gather', 'ppermute', 'all_to_all' or
    'reduce_scatter' (suffixed '[cond]' under lax.cond); ``width`` is
    the number of independent operands XLA's combiner launches as one
    collective; ``elems`` the total elements moved per launch — so the
    reference parity claim "2 scalar all-reduces/iter" pins as two
    ('psum', 1, 1) entries, and pipelined CG's fused dots as one
    ('psum', 1, 2).

    "iter" is the flattened view across all loop depths. "by_depth"
    splits by loop-nesting depth — e.g. a convergence psum under a
    ``lax.cond`` in the outer block loop (Chebyshev's ``check_every``)
    appears at depth 1 even though it only launches every k-th
    iteration; halo ppermutes inside an inner basis loop appear at
    depth 2.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    groups: List[_Group] = []
    _collect(jaxpr.jaxpr, 0, groups, itertools.count())
    setup = [g for g in groups if g.depth == 0]
    inner = [g for g in groups if g.depth > 0]
    depths = sorted({g.depth for g in inner})
    return {
        "setup": _fmt(setup),
        "iter": _fmt(inner),
        "by_depth": {
            d: _fmt([g for g in inner if g.depth == d]) for d in depths
        },
    }


def _taint_walk(jaxpr, tainted_in: frozenset) -> Tuple[bool, bool]:
    """Propagate reduction-result taint through one jaxpr region.

    ``tainted_in``: the subset of ``jaxpr.invars`` considered tainted
    on entry. Reduction collectives encountered here taint their
    outputs. Returns ``(hit, out_taint)``: ``hit`` is True if any
    non-reduction collective (ppermute / all_gather / all_to_all /
    reduce_scatter — the mat-vec communication) consumed taint;
    ``out_taint`` whether any of the region's outvars are tainted.
    Sub-jaxprs are entered conservatively: if the mapping between an
    eqn's invars and its sub-jaxpr's invars is not the standard 1:1
    (or cond's invars[1:]), taint on ANY input taints all sub invars.
    """
    tainted = set(v for v in tainted_in)
    hit = False
    for eqn in jaxpr.eqns:
        in_taint = any(
            (not isinstance(v, jax.extend.core.Literal)) and v in tainted
            for v in eqn.invars
        )
        name = eqn.primitive.name
        if name in REDUCTIONS:
            tainted.update(eqn.outvars)
            continue
        if name in OTHER_COLLECTIVES and in_taint:
            hit = True
        sub_taint_out = False
        for sub in _subjaxprs(eqn):
            n_in = len(sub.invars)
            if name == "cond" and n_in == len(eqn.invars) - 1:
                seeds = frozenset(
                    sv
                    for sv, ev in zip(sub.invars, eqn.invars[1:])
                    if (not isinstance(ev, jax.extend.core.Literal))
                    and ev in tainted
                )
            elif n_in == len(eqn.invars):
                seeds = frozenset(
                    sv
                    for sv, ev in zip(sub.invars, eqn.invars)
                    if (not isinstance(ev, jax.extend.core.Literal))
                    and ev in tainted
                )
            else:  # unknown calling convention: be conservative
                seeds = frozenset(sub.invars) if in_taint else frozenset()
            sub_hit, sub_out = _taint_walk(sub, seeds)
            hit = hit or sub_hit
            sub_taint_out = sub_taint_out or sub_out
        if in_taint or sub_taint_out:
            tainted.update(eqn.outvars)
    out_taint = any(v in tainted for v in jaxpr.outvars)
    return hit, out_taint


def _loop_bodies(jaxpr, out: List) -> None:
    for eqn in jaxpr.eqns:
        if eqn.primitive.name in _LOOPS:
            out.extend(_subjaxprs(eqn))
        for sub in _subjaxprs(eqn):
            _loop_bodies(sub, out)


def reduction_feeds_collective(fn, *args, **kwargs) -> bool:
    """Does any mat-vec communication primitive (ppermute, all_gather,
    all_to_all, reduce_scatter) inside the solve's iteration loop
    transitively consume a SAME-iteration reduction result?

    This is the assertable form of the communication-HIDING claim
    (cgx.solver.gvpipe): when False, the all-reduce and the mat-vec's
    communication have no data dependence within one loop body, so
    XLA's async collectives overlap the all-reduce latency with the
    mat-vec. Chronopoulos-Gear ('pipelined') is True — its next
    mat-vec input u = M^-1 r needs alpha, which needs the reduction;
    Ghysels-Vanroose ('gvpipe') is False. Cross-iteration dependence
    (this iteration's psum feeding the NEXT mat-vec via the carry) is
    intentionally out of scope: that dependence is what makes it an
    iterative method.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    bodies: List = []
    _loop_bodies(jaxpr.jaxpr, bodies)
    for body in bodies:
        hit, _ = _taint_walk(body, frozenset())
        if hit:
            return True
    return False


def _depth_walk(
    jaxpr, in_depths: Dict[Any, int], in_cond: bool, include_cond: bool
) -> Tuple[int, Dict[Any, int]]:
    """Longest dependent-collective chain through one jaxpr region.

    ``in_depths`` maps this jaxpr's invars to the collective-chain
    depth already feeding them. Returns ``(max_depth, out_depths)``
    where ``out_depths`` maps the region's outvars to their depths.
    Collectives inside lax.cond branches are skipped unless
    ``include_cond`` (they fire on a cadence, not every iteration).
    """
    depth: Dict[Any, int] = dict(in_depths)
    max_depth = 0

    def d_of(v):
        if isinstance(v, jax.extend.core.Literal):
            return 0
        return depth.get(v, 0)

    for eqn in jaxpr.eqns:
        d_in = max((d_of(v) for v in eqn.invars), default=0)
        name = eqn.primitive.name
        d_out = d_in
        if name in COLLECTIVES and (include_cond or not in_cond):
            d_out = d_in + 1
            max_depth = max(max_depth, d_out)
        sub_cond = in_cond or name == "cond"
        for sub in _subjaxprs(eqn):
            n_in = len(sub.invars)
            if name == "cond" and n_in == len(eqn.invars) - 1:
                seeds = {
                    sv: d_of(ev)
                    for sv, ev in zip(sub.invars, eqn.invars[1:])
                }
            elif n_in == len(eqn.invars):
                seeds = {
                    sv: d_of(ev) for sv, ev in zip(sub.invars, eqn.invars)
                }
            else:  # unknown calling convention: be conservative
                seeds = {sv: d_in for sv in sub.invars}
            sub_max, sub_out = _depth_walk(
                sub, seeds, sub_cond, include_cond
            )
            max_depth = max(max_depth, sub_max)
            d_out = max(d_out, max(sub_out.values(), default=0))
        for v in eqn.outvars:
            depth[v] = d_out
    return max_depth, {v: d_of(v) for v in jaxpr.outvars}


def collective_critical_depth(
    fn, *args, include_cond: bool = False, **kwargs
) -> int:
    """Longest chain of DEPENDENT collectives inside one iteration of
    the solve's loop — the number of collective latencies that must be
    paid *in series* per iteration, the honest per-iteration latency
    metric the per-launch counts can't see:

    - reference CG: 3 (mat-vec gather/halo -> conj psum -> rsnew psum,
      cg.cc:101->106->117 — each waits on the last)
    - pipelined (Chronopoulos-Gear): 2 (the fused psum -> the next
      mat-vec's comm, via alpha -> u)
    - gvpipe (Ghysels-Vanroose): 1 (the psum and the mat-vec comm both
      read only the carry — XLA overlaps them; this is the
      communication-hiding claim in assertable form)

    Cross-iteration chains (via the loop carry) are out of scope —
    that dependence is what makes it an iterative method. Collectives
    under ``lax.cond`` (cadence-gated replacements / convergence
    checks) are excluded unless ``include_cond``.
    """
    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    bodies: List = []
    _loop_bodies(jaxpr.jaxpr, bodies)
    best = 0
    for body in bodies:
        d, _ = _depth_walk(body, {}, False, include_cond)
        best = max(best, d)
    return best


def iter_counts(sig: Dict[str, Any]) -> Dict[str, int]:
    """Per-iteration launch counts by primitive (fused group = 1)."""
    out: Dict[str, int] = {}
    for prim, _w, _e in sig["iter"]:
        out[prim] = out.get(prim, 0) + 1
    return out


class capture:
    """Context manager recording every (jitted_fn, args) pair the
    solvers execute, for collective-signature introspection::

        with collectives.capture() as cap:
            sharded_cg_solve(mat, b, mesh=mesh)
        sig = cap.signature()   # of the last (main-loop) program

    Solvers cooperate by routing their jitted calls through
    :func:`run_recorded`; outside a capture block that helper is a
    plain call with zero overhead.
    """

    def __init__(self):
        self.records: List[Tuple[Any, tuple]] = []

    def __enter__(self):
        _CAPTURE.append(self)
        return self

    def __exit__(self, *exc):
        _CAPTURE.remove(self)
        return False

    def signature(self, index: int = -1) -> Dict[str, Any]:
        fn, args = self.records[index]
        return collective_signature(fn, *args)


_CAPTURE: List[capture] = []


def run_recorded(fn, *args):
    """Call ``fn(*args)``; under :class:`capture`, record the pair."""
    for cap in _CAPTURE:
        cap.records.append((fn, args))
    return fn(*args)
