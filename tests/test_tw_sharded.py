"""Sharded triple-word refinement (round-4 VERDICT item 4).

The reference's quality gate runs on its DISTRIBUTED solver
(cg.cc:144-154 after the Gatherv); these tests pin cgx's multi-chip
fp64-quality analogue on the 8-device virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cgx.mats.containers import DIAMatrix
from cgx.mats.generators import lap2d_fd_coo_lower
from cgx.ops.tw32 import tw_to_f64
from cgx.parallel.tw_sharded import sharded_tw_solve
from cgx.solver.operators import DiaOperator
from cgx.solver.refine import refine_pcg_sweeps_tw


def _problem(g: int):
    mat = DIAMatrix.from_coo(lap2d_fd_coo_lower(g))
    n = mat.shape[0]
    rng = np.random.default_rng(0)
    b = rng.standard_normal(n)
    return mat, b


def _true_rel(mat, x64, b):
    import scipy.sparse as sp

    n = mat.shape[0]
    bands = np.asarray(mat.bands, np.float64)
    ri, ci, vals = [], [], []
    for k, off in enumerate(mat.offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        idx = np.arange(i0, i1)
        ri.append(idx)
        ci.append(idx + off)
        vals.append(bands[k, i0:i1])
    a = sp.coo_matrix(
        (np.concatenate(vals), (np.concatenate(ri), np.concatenate(ci))),
        shape=(n, n),
    )
    x64 = np.asarray(x64, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a @ x64 - b) / np.linalg.norm(b))


def test_bitwise_parity_with_single_device():
    """inner_dot='gathered': every reduction in the sharded solve runs
    in canonical full-vector order, so the whole refinement —
    trajectory, sweep count, and all three solution WORDS — is bitwise
    identical to the single-device loop."""
    mat, b = _problem(32)
    op64 = DiaOperator(jnp.asarray(mat.bands, jnp.float64),
                       tuple(mat.offsets))
    ref = refine_pcg_sweeps_tw(
        op64, jnp.asarray(b), precond=None, rtol=1e-12,
        inner_maxiter=200,
    )
    got = sharded_tw_solve(
        mat, b, n_devices=8, rtol=1e-12, inner_maxiter=200,
        precond=None, inner_dot="gathered",
    )
    assert got.outer_iterations == ref.outer_iterations
    for w_got, w_ref in zip(got.x_words, ref.x_words):
        np.testing.assert_array_equal(np.asarray(w_got),
                                      np.asarray(w_ref))
    np.testing.assert_array_equal(np.asarray(got.residual_norm),
                                  np.asarray(ref.residual_norm))


@pytest.mark.parametrize("n_devices", [4, 8])
def test_psum_inner_certifies_same_gate(n_devices):
    """Production inner_dot='psum' (the reference's ddot+Allreduce
    semantics): same sweep count, same certified quality, solutions
    equal far below the fp64 floor."""
    mat, b = _problem(32)
    op64 = DiaOperator(jnp.asarray(mat.bands, jnp.float64),
                       tuple(mat.offsets))
    ref = refine_pcg_sweeps_tw(
        op64, jnp.asarray(b), precond=None, rtol=1e-12,
        inner_maxiter=200,
    )
    got = sharded_tw_solve(
        mat, b, n_devices=n_devices, rtol=1e-12, inner_maxiter=200,
        precond=None, inner_dot="psum",
    )
    assert bool(got.converged) and bool(ref.converged)
    assert got.outer_iterations == ref.outer_iterations
    x_got = np.asarray(tw_to_f64(got.x_words), np.float64)
    x_ref = np.asarray(tw_to_f64(ref.x_words), np.float64)
    scale = np.max(np.abs(x_ref))
    np.testing.assert_allclose(x_got, x_ref, rtol=0, atol=1e-13 * scale)
    assert _true_rel(mat, x_got, b) < 1e-12


def test_mg_inner_on_grid():
    """MG-PCG sharded inner (the flagship configuration): converges to
    the gate in few sweeps with far fewer inner iterations."""
    mat, b = _problem(32)
    res = sharded_tw_solve(
        mat, b, n_devices=8, rtol=1e-12, inner_maxiter=80,
        precond="mg",
    )
    assert bool(res.converged)
    assert _true_rel(mat, np.asarray(tw_to_f64(res.x_words)), b) < 1e-12
    # MG inner should be dramatically cheaper than plain CG inner
    assert int(res.inner_iterations[0]) < 200


def test_collective_signature():
    """Pin the tw outer's per-sweep collectives: 1 stacked ppermute
    pair (halo) + 1 fp64 all_gather (canonical norm); inner adds its
    own psums/halos. Counted on the traced jaxpr."""
    mat, b = _problem(16)
    from functools import partial

    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import _DiaHalo, _PsumDot
    from cgx.parallel.tw_sharded import _tw_sharded_loop
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(4)
    n = mat.shape[0]
    offsets = tuple(int(o) for o in mat.offsets)
    bands32 = jnp.asarray(mat.bands, jnp.float32)
    loop = partial(
        _tw_sharded_loop,
        offsets=offsets, sweeps=4, inner_tol=1e-6, inner_maxiter=8,
        matvec=_DiaHalo("rows", offsets, n // 4, 4),
        precond=None, dot=_PsumDot("rows", None),
        axis="rows", n_shards=4,
    )
    fn = jax.shard_map(
        loop, mesh=mesh,
        in_specs=(P(None, "rows"), P(None, "rows"), P("rows"), P()),
        out_specs=(P(None, "rows"), P(), P(), P(), P()),
        check_vma=False,
    )
    jaxpr = str(jax.make_jaxpr(fn)(
        bands32, bands32, jnp.asarray(b), jnp.asarray(1e-10)
    ))
    assert "ppermute" in jaxpr
    assert "all_gather" in jaxpr
    assert "psum" in jaxpr


def test_halo_matvec_matches_single_device():
    """The halo'd tw banded mat-vec is bitwise equal to
    banded_matvec_tw on every shard (interiors AND edges)."""
    from cgx.ops.tw32 import banded_matvec_tw, tw_from_f64
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.tw_sharded import _tw_halo_matvec
    from jax.sharding import PartitionSpec as P

    mat, _ = _problem(16)
    n = mat.shape[0]
    offsets = tuple(int(o) for o in mat.offsets)
    bands32 = jnp.asarray(mat.bands, jnp.float32)
    rng = np.random.default_rng(1)
    x64 = jnp.asarray(rng.standard_normal(n))
    x_tw = tw_from_f64(x64)
    ref = banded_matvec_tw(bands32, offsets, x_tw)

    mesh = make_mesh(4)
    fn = jax.jit(jax.shard_map(
        lambda bl, xw: _tw_halo_matvec(
            bl, offsets, xw, axis="rows", n_shards=4),
        mesh=mesh,
        in_specs=(P(None, "rows"), (P("rows"), P("rows"), P("rows"))),
        out_specs=(P("rows"), P("rows"), P("rows")),
        check_vma=False,
    ))
    got = fn(bands32, x_tw)
    for w_got, w_ref in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(w_got),
                                      np.asarray(w_ref))


def test_offgrid_split_bands_parity_and_gate():
    """Non-f32-representable bands (poisson2d_var): the sharded tw
    outer carries the exact 3-word band split, matches the
    single-device refinement trajectory, and certifies the TRUE f64
    operator (longdouble cross-check)."""
    from cgx.mats.generators import poisson2d_var, source_term

    g = 32
    n = g * g
    cells = 8
    board = np.where(
        (np.indices((cells, cells)).sum(axis=0) % 2).astype(bool),
        8.0, 1.0,
    )
    coeff = np.kron(board, np.ones((g // cells, g // cells)))
    mat = poisson2d_var(g, coeff)
    from cgx.ops.tw32 import bands_f32_exact

    assert not bands_f32_exact(mat.bands)
    b = np.asarray(source_term(n), np.float64)

    op64 = DiaOperator(jnp.asarray(mat.bands, jnp.float64),
                       tuple(mat.offsets))
    ref = refine_pcg_sweeps_tw(
        op64, jnp.asarray(b), precond=None, rtol=1e-12,
        inner_maxiter=2000,
    )
    got = sharded_tw_solve(
        mat, b, n_devices=8, rtol=1e-12, inner_maxiter=2000,
        precond=None, inner_dot="gathered",
    )
    assert bool(got.converged) and bool(ref.converged)
    assert got.outer_iterations == ref.outer_iterations
    for w_got, w_ref in zip(got.x_words, ref.x_words):
        np.testing.assert_array_equal(np.asarray(w_got),
                                      np.asarray(w_ref))

    # longdouble gate on the f64 operator
    bands_ld = np.asarray(mat.bands, np.longdouble)
    xl = sum(np.asarray(got.x_words[i], np.longdouble) for i in range(3))
    bl = b.astype(np.longdouble)
    ax = np.zeros(n, np.longdouble)
    for k, off in enumerate(mat.offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        ax[i0:i1] += bands_ld[k, i0:i1] * xl[i0 + off : i1 + off]
    rel = float(np.sqrt(np.sum((ax - bl) ** 2))
                / np.sqrt(np.sum(bl * bl)))
    assert rel < 1e-11, rel
