"""Collective-count regression tests (VERDICT r1 item 2).

Every sharded method's per-iteration communication pattern is a design
claim stated in its docstring; these tests pin those claims against
the traced jaxpr via cgx.utils.collectives so a refactor that silently
adds, splits, or grows a collective fails CI.

Signature entries are (primitive, fused_width, elements_per_launch) in
program order; '[cond]' marks collectives under a lax.cond that fire
only when the (replicated) predicate is true. Reference parity targets
/root/reference/code/MPI/cg.cc: two scalar MPI_Allreduce (lines
106/117) + one MPI_Allgatherv of the N-vector p (line 135) per
iteration.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cgx.mats.generators import lap2d_fd, source_term
from cgx.parallel.mesh import make_mesh
from cgx.parallel.sharded_cg import (
    sharded_block_cg_solve,
    sharded_block_deflated_cg_solve,
    sharded_cg_solve,
    sharded_deflated_cg_solve,
    sharded_refine_fixed_sweeps,
)
from cgx.utils import collectives as C

G = 32  # 32x32 grid, N=1024, 8 shards: n_loc=128, DIA halo = G = 32
N = G * G


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def dia():
    return lap2d_fd(G)


@pytest.fixture(scope="module")
def b():
    return source_term(N)


def sig_of(fn, *args, **kwargs):
    with C.capture() as cap:
        fn(*args, **kwargs)
    return cap.signature()


# --- the counter itself -------------------------------------------------


def test_fused_tuple_psum_is_one_group(mesh):
    """lax.psum of a tuple = several psum eqns XLA combines into ONE
    launch; the signature must report one group with the tuple width."""

    def f(x):
        a, bb = jax.lax.psum((x.sum(), (x * 2).sum()), "rows")
        return x * a * bb

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=P("rows"), out_specs=P("rows")
        )
    )
    sig = C.collective_signature(fn, jnp.zeros(8))
    assert sig["setup"] == [("psum", 2, 2)]
    assert sig["iter"] == []


def test_dependent_psums_do_not_merge(mesh):
    """A reduction whose input depends on a previous reduction's
    output cannot ride the same launch."""

    def f(x):
        a = jax.lax.psum(x.sum(), "rows")
        bb = jax.lax.psum((x * a).sum(), "rows")  # depends on a
        return x * bb

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=P("rows"), out_specs=P("rows")
        )
    )
    sig = C.collective_signature(fn, jnp.zeros(8))
    assert sig["setup"] == [("psum", 1, 1), ("psum", 1, 1)]


def test_independent_separated_psums_merge(mesh):
    """Two independent reductions separated by elementwise compute
    still combine (XLA moves them together)."""

    def f(x):
        a = jax.lax.psum(x.sum(), "rows")
        y = x * 3.0  # unrelated compute between the reductions
        bb = jax.lax.psum(y.sum(), "rows")
        return x * a * bb

    fn = jax.jit(
        jax.shard_map(
            f, mesh=mesh, in_specs=P("rows"), out_specs=P("rows")
        )
    )
    sig = C.collective_signature(fn, jnp.zeros(8))
    assert sig["setup"] == [("psum", 2, 2)]


# --- reference-parity CG (2 scalar all-reduce + 1 gather of p) ----------


def test_reference_allgather_comm_parity(mesh, dia, b):
    """Exact reference pattern: one all_gather of the FULL p (N elems,
    cg.cc:135) + two SEPARATE scalar psums (cg.cc:106, 117 — they
    cannot fuse: rsnew's dot depends on alpha which depends on conj)."""
    dense = np.asarray(dia.to_dense())
    sig = sig_of(
        sharded_cg_solve, dense, b, mesh=mesh, strategy="allgather"
    )
    assert sig["iter"] == [
        ("all_gather", 1, N),
        ("psum", 1, 1),
        ("psum", 1, 1),
    ]
    # init: gather p0 + rsold all-reduce (cg.cc:87-92)
    assert sig["setup"] == [("all_gather", 1, N), ("psum", 1, 1)]


def test_reducescatter_strategy(mesh, dia, b):
    """Symmetry strategy: psum_scatter of the partial matvec (N/p
    elems) replaces the gather; the two scalar dots stay."""
    dense = np.asarray(dia.to_dense())
    sig = sig_of(
        sharded_cg_solve, dense, b, mesh=mesh, strategy="reducescatter"
    )
    assert sig["iter"] == [
        ("reduce_scatter", 1, N // 8),
        ("psum", 1, 1),
        ("psum", 1, 1),
    ]


def test_halo_strategy_bandwidth_not_N(mesh, dia, b):
    """Banded operators exchange O(bandwidth)=G-element halos with the
    two mesh neighbours instead of gathering N elements."""
    sig = sig_of(sharded_cg_solve, dia, b, mesh=mesh, strategy="halo")
    assert sig["iter"] == [
        ("ppermute", 1, G),
        ("ppermute", 1, G),
        ("psum", 1, 1),
        ("psum", 1, 1),
    ]


def test_halo_stream2d_same_signature(mesh, dia, b):
    """local_kernel='stream2d' swaps only the LOCAL mat-vec for the
    Pallas streaming kernel; the collective signature must be
    byte-identical to the XLA halo path (the design claim in
    _DiaHalo's docstring)."""
    sig_xla = sig_of(sharded_cg_solve, dia, b, mesh=mesh, strategy="halo")
    sig_st = sig_of(
        sharded_cg_solve, dia, b, mesh=mesh, strategy="halo",
        local_kernel="stream2d",
    )
    assert sig_st["iter"] == sig_xla["iter"]
    assert sig_st["setup"] == sig_xla["setup"]


def test_block_jacobi_same_signature_as_jacobi(mesh, dia, b):
    """Block-Jacobi's apply is a shard-LOCAL batched matmul (blocks
    never straddle shards), so the per-iteration collective signature
    is identical to point Jacobi's — the design claim in
    cgx.solver.precond.block_jacobi."""
    kw = dict(mesh=mesh, strategy="halo")
    sig_pj = sig_of(sharded_cg_solve, dia, b, precond="jacobi", **kw)
    sig_bj = sig_of(
        sharded_cg_solve, dia, b,
        precond="block_jacobi", precond_block_size=16, **kw
    )
    assert sig_bj["iter"] == sig_pj["iter"]
    assert sig_bj["setup"] == sig_pj["setup"]


# --- communication-avoiding methods -------------------------------------


def test_pipelined_single_fused_psum(mesh, dia, b):
    """Chronopoulos-Gear: ONE psum launch per iteration carrying both
    recurrence dots (length-2 payload)."""
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="pipelined",
    )
    assert sig["iter"] == [
        ("psum", 1, 2),
        ("ppermute", 1, G),
        ("ppermute", 1, G),
    ]


def test_pipelined_preconditioned_three_way_fused_psum(mesh, dia, b):
    """With a preconditioner the fused payload grows to 3 dots — still
    ONE launch."""
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="pipelined",
        precond="jacobi",
    )
    assert sig["iter"] == [
        ("psum", 1, 3),
        ("ppermute", 1, G),
        ("ppermute", 1, G),
    ]


def test_gvpipe_one_fused_psum_and_cond_replacement(mesh, dia, b):
    """Ghysels-Vanroose: ONE fused psum per iteration (like pipelined)
    plus the cadence-gated residual replacement's four mat-vecs (8
    [cond] ppermutes) that fire every gv_replace_every iterations."""
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="gvpipe",
    )
    uncond = [e for e in sig["iter"] if "[cond]" not in e[0]]
    assert uncond == [
        ("psum", 1, 2),
        ("ppermute", 1, G),
        ("ppermute", 1, G),
    ]
    cond = [e for e in sig["iter"] if "[cond]" in e[0]]
    assert cond == [("ppermute[cond]", 1, G)] * 8


def test_gvpipe_preconditioned_three_way_fused_psum(mesh, dia, b):
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="gvpipe",
        precond="jacobi",
    )
    uncond = [e for e in sig["iter"] if "[cond]" not in e[0]]
    assert uncond == [
        ("psum", 1, 3),
        ("ppermute", 1, G),
        ("ppermute", 1, G),
    ]


def test_collective_critical_depth_reference_vs_pipelined_vs_gvpipe(
    mesh, dia, b
):
    """THE communication-hiding claim, in assertable form: the number
    of collective latencies paid in series per iteration. Reference
    CG chains halo -> conj psum -> rsnew psum (cg.cc:101,106,117 — 3
    serial latencies); Chronopoulos-Gear leaves the fused psum on the
    next mat-vec's critical path (2); Ghysels-Vanroose decouples them
    so XLA overlaps the all-reduce with the mat-vec (1)."""

    def depth(method, **kw):
        with C.capture() as cap:
            sharded_cg_solve(
                dia, b, mesh=mesh, strategy="halo", method=method,
                tol=1e-10, **kw
            )
        fn, args = cap.records[-1]
        return C.collective_critical_depth(fn, *args)

    assert depth("reference") == 3
    assert depth("pipelined") == 2
    assert depth("gvpipe") == 1
    assert depth("gvpipe", precond="jacobi") == 1


def test_reduction_feeds_matvec_comm_contrast(mesh, dia, b):
    """Directional variant: in pipelined CG the mat-vec communication
    consumes the same-iteration reduction result; in gvpipe it never
    does."""

    def feeds(method):
        with C.capture() as cap:
            sharded_cg_solve(
                dia, b, mesh=mesh, strategy="halo", method=method,
                tol=1e-10,
            )
        fn, args = cap.records[-1]
        return C.reduction_feeds_collective(fn, *args)

    assert feeds("pipelined") is True
    assert feeds("gvpipe") is False


def test_chebyshev_zero_unconditional_reductions(mesh, dia, b):
    """Chebyshev iteration: halos only; the single reduction is under
    lax.cond and fires every check_every iterations."""
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="chebyshev",
    )
    assert sig["iter"] == [
        ("ppermute", 1, G),
        ("ppermute", 1, G),
        ("psum[cond]", 1, 1),
    ]
    counts = C.iter_counts(sig)
    assert counts.get("psum", 0) == 0  # ZERO unconditional reductions


def test_sstep_one_gram_psum_per_block(mesh, dia, b):
    """s-step CG: one fused (2s+1)^2 Gram psum per OUTER block (= per
    s iterations); the basis build costs 2 halos per basis mat-vec."""
    s = 4
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="sstep",
        sstep_s=s,
    )
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    assert psums == [("psum", 1, (2 * s + 1) ** 2)]
    halos = [e for e in sig["iter"] if e[0] == "ppermute"]
    assert len(halos) == 2 * (2 * s - 1)  # 2s-1 basis mat-vecs/block


# --- block / deflated ----------------------------------------------------


def test_block_cg_one_fused_gram_psum(mesh, dia):
    """Breakdown-free block CG: ONE fused Gram psum per iteration
    (the (3s, 3s) Gram of [P Q R], s=3 -> 81 elems)."""
    rs = np.random.default_rng(0)
    bb = rs.standard_normal((N, 3))
    sig = sig_of(sharded_block_cg_solve, dia, bb, mesh=mesh)
    s = 3
    assert sig["iter"] == [
        ("ppermute", 1, G * s),
        ("ppermute", 1, G * s),
        ("psum", 1, (3 * s) ** 2),
    ]


def test_deflated_three_psums(mesh, dia, b):
    """Deflated CG: the documented three per-iteration reductions
    (conj dot; W^T Ap deflation projection; rsnew) — chained, so three
    separate launches."""
    rs = np.random.default_rng(0)
    w = np.linalg.qr(rs.standard_normal((N, 4)))[0]
    sig = sig_of(
        sharded_deflated_cg_solve, dia, b, w=w, mesh=mesh
    )
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    assert len(psums) == 3, sig["iter"]


def test_block_deflated_three_psums(mesh, dia):
    rs = np.random.default_rng(0)
    w = np.linalg.qr(rs.standard_normal((N, 4)))[0]
    bb = rs.standard_normal((N, 3))
    sig = sig_of(
        sharded_block_deflated_cg_solve, dia, bb, w=w, mesh=mesh
    )
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    assert len(psums) == 3, sig["iter"]


def test_refine_sweep_psums(mesh, dia, b):
    """Mixed-precision refinement: fp32 inner sweeps cost 1 scalar
    psum each; the fp64 outer correction adds its own."""
    sig = sig_of(sharded_refine_fixed_sweeps, dia, b, mesh=mesh)
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    assert all(e[2] == 1 for e in psums), sig["iter"]  # scalars only


# --- multigrid ----------------------------------------------------------


def test_mg_halo_volume_per_iteration(mesh):
    """Sharded MG-CG at g=64/p=8: per iteration, the fine halo
    mat-vec + V-cycle transfers/smoothing exchange 14 neighbour
    halos and ONE tiny tail all_gather; reductions are the CG dots
    only (conj + fused rsnew/r-dot-z pair). No collective may be
    added without this test noticing."""
    from cgx.parallel.mg_sharded import sharded_mg_cg_solve

    g = 64
    sig = sig_of(
        sharded_mg_cg_solve, lap2d_fd(g), source_term(g * g),
        mesh=mesh, tol=1e-8,
    )
    it = sig["iter"]
    assert [e for e in it if e[0].startswith("psum")] == [
        ("psum", 1, 1),
        ("psum", 2, 2),
    ]
    gathers = [e for e in it if e[0] == "all_gather"]
    assert gathers == [("all_gather", 1, 1024)]  # replicated tail only
    halos = [e for e in it if e[0] == "ppermute"]
    assert len(halos) == 14
    # total per-iteration neighbour-exchange volume stays O(g), not O(N)
    assert sum(e[2] for e in halos) == 768  # 10x64 + 4x32 elems


def test_batched2d_pipelined_fuses_all_columns(dia):
    """2-D (rows x rhs) mesh, pipelined: the per-column recurrence
    dots ride ONE fused psum (4 elems for 2 local columns x 2 dots)."""
    from cgx.parallel.batched2d import sharded_cg_solve_batched

    rs = np.random.default_rng(0)
    Bm = rs.standard_normal((4, N))
    sig = sig_of(
        sharded_cg_solve_batched,
        dia,
        Bm,
        row_groups=4,
        rhs_groups=2,
        method="pipelined",
    )
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    # one scalar convergence reduction + one fused dots psum
    assert psums == [("psum", 1, 1), ("psum", 1, 4)], sig["iter"]


def test_sstep_deephalo_collectives(mesh, dia, b):
    """sstep_powers='deephalo': the whole s-iteration block costs 2
    deep ppermutes (p and r edges STACKED per direction, depth s*h) +
    1 Gram psum — message count independent of s. The one-time
    band-halo exchange (2 ppermutes) sits in setup, hoisted out of
    the loop."""
    s = 4
    d = s * G  # h = G for the 5-point stencil
    sig = sig_of(
        sharded_cg_solve,
        dia,
        b,
        mesh=mesh,
        strategy="halo",
        method="sstep",
        sstep_s=s,
        sstep_powers="deephalo",
    )
    psums = [e for e in sig["iter"] if e[0].startswith("psum")]
    assert psums == [("psum", 1, (2 * s + 1) ** 2)]
    halos = [e for e in sig["iter"] if e[0] == "ppermute"]
    assert len(halos) == 2
    assert all(e[2] == 2 * d for e in halos)  # p and r ride together
    setup_pp = [e for e in sig["setup"] if e[0] == "ppermute"]
    assert len(setup_pp) >= 2  # band-halo exchange, loop-invariant


def test_harvest_adds_zero_collectives(mesh, dia, b):
    """sharded_cg_solve_harvest captures the Lanczos window locally:
    its per-iteration signature is EXACTLY plain reference CG's
    (2 scalar psums + the halo pair) — the harvest is free."""
    from cgx.parallel.sharded_cg import sharded_cg_solve_harvest

    plain = sig_of(
        sharded_cg_solve, dia, b, mesh=mesh, strategy="halo"
    )
    with C.capture() as cap:
        sharded_cg_solve_harvest(
            dia, b, k=8, mesh=mesh, strategy="halo", tol=1e-10
        )
    harvest = cap.signature()
    assert harvest["iter"] == plain["iter"]


def test_deflated_pcg_same_launch_count_wider_final(mesh, dia, b):
    """Deflated PCG: the (AW)^T z projector contraction is independent
    of the rsnew/rr dots given the fused [W,AW]^T r contraction, so
    XLA's combiner merges it into the SAME final launch — deflated PCG
    pays the same THREE psum launches as plain deflated CG, the last
    just widens from (1,) to (k+2,)."""
    k = 8
    w = np.linalg.qr(
        np.random.default_rng(0).standard_normal((N, k))
    )[0]
    plain = sig_of(
        sharded_deflated_cg_solve, dia, b, w=w, mesh=mesh, tol=1e-8
    )
    pcg = sig_of(
        sharded_deflated_cg_solve, dia, b, w=w, mesh=mesh, tol=1e-8,
        precond="jacobi",
    )

    def psums(sig):
        return [e for e in sig["iter"] if e[0].startswith("psum")]

    assert psums(plain) == [
        ("psum", 1, 1),        # conj
        ("psum", 1, 2 * k),    # fused [W, AW]^T r
        ("psum", 1, 1),        # rsnew
    ]
    assert psums(pcg) == [
        ("psum", 1, 1),
        ("psum", 1, k),        # guard W^T r only (AW half unused)
        ("psum", 3, k + 2),    # rsnew + rr + (AW)^T z, one launch
    ]


def test_batched2d_gvpipe_signature(dia):
    """2-D (rows x rhs) mesh, gvpipe: per iteration ONE fused dots
    psum over rows (4 elems for 2 local columns x 2 dots) + the
    liveness vote and the replacement-cadence vote over rhs (scalar
    each) + the halo pair; the replacement's four plane mat-vecs (8
    ppermutes) sit under lax.cond."""
    from cgx.parallel.batched2d import sharded_cg_solve_batched

    rs = np.random.default_rng(0)
    Bm = rs.standard_normal((4, N))
    sig = sig_of(
        sharded_cg_solve_batched,
        dia,
        Bm,
        row_groups=4,
        rhs_groups=2,
        method="gvpipe",
    )
    uncond = [e for e in sig["iter"] if "[cond]" not in e[0]]
    psums = [e for e in uncond if e[0] == "psum"]
    # liveness vote (1) + any-replacement vote (1) + fused dots (4)
    assert sorted(p[2] for p in psums) == [1, 1, 4], sig["iter"]
    halos = [e for e in uncond if e[0] == "ppermute"]
    assert len(halos) == 2
    cond_pp = [e for e in sig["iter"] if e[0] == "ppermute[cond]"]
    assert len(cond_pp) == 8  # four replacement plane mat-vecs
