"""Pallas kernel tests against jnp/NumPy oracles (interpret mode on
CPU; the same kernels compile for TPU via Mosaic)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx.mats.generators import lap2d_fd, lap2d_reference, lap3d_fd
from cgx.ops.axpy import fused_axpby, fused_update_rs
from cgx.ops.dia_spmv import (
    dia_matvec,
    dia_matvec_dot,
    dia_matvec_stream,
    dia_matvec_stream2d,
)
from cgx.ops.matvec import dense_matvec, dense_matvec_dot


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("shape", [(256, 256), (300, 300), (129, 257)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_dense_matvec(rng, shape, dtype):
    a = rng.standard_normal(shape).astype(dtype)
    x = rng.standard_normal(shape[1]).astype(dtype)
    got = np.asarray(
        dense_matvec(
            jnp.asarray(a), jnp.asarray(x), block_rows=64, block_cols=128, interpret=True
        )
    )
    want = a @ x
    rtol = 1e-5 if dtype == np.float32 else 1e-12
    np.testing.assert_allclose(got, want, rtol=rtol, atol=rtol * np.abs(want).max())


def test_dense_matvec_dot(rng):
    n = 256
    a = lap2d_reference(n).to_dense()
    x = rng.standard_normal(n)
    y, d = dense_matvec_dot(
        jnp.asarray(a), jnp.asarray(x), block_rows=64, block_cols=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=1e-12)
    np.testing.assert_allclose(float(d), x @ (a @ x), rtol=1e-12)


@pytest.mark.parametrize(
    "make,n",
    [
        (lap2d_reference, 500),
        (lap2d_reference, 1024),
        (lambda n: lap2d_fd(n), 20),  # N=400
        (lambda n: lap3d_fd(n), 7),  # N=343
    ],
)
def test_dia_matvec(rng, make, n):
    dia = make(n)
    x = rng.standard_normal(dia.shape[0])
    got = np.asarray(
        dia_matvec(
            jnp.asarray(dia.bands),
            jnp.asarray(x),
            offsets=tuple(dia.offsets),
            block=256,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, dia.mat_vec(x), rtol=1e-13)


@pytest.mark.parametrize(
    "make,n,block",
    [
        (lap2d_reference, 500, 256),  # 2 blocks, ragged tail
        (lap2d_reference, 1024, 256),  # 4 exact blocks
        (lap2d_reference, 200, 256),  # single block (n < block)
        (lambda n: lap2d_fd(n), 20, 128),  # N=400, small block
        (lambda n: lap3d_fd(n), 7, 128),  # N=343, 3-D offsets
    ],
)
def test_dia_matvec_stream(rng, make, n, block):
    dia = make(n)
    x = rng.standard_normal(dia.shape[0])
    got = np.asarray(
        dia_matvec_stream(
            jnp.asarray(dia.bands),
            jnp.asarray(x),
            offsets=tuple(dia.offsets),
            block=block,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, dia.mat_vec(x), rtol=1e-13)


@pytest.mark.parametrize(
    "make,n,rows,cols",
    [
        (lap2d_reference, 500, 8, 128),  # inc+1 offsets, ragged tail
        (lambda n: lap2d_fd(n), 33, 4, 128),  # N=1089
        (lambda n: lap3d_fd(n), 7, 2, 128),  # N=343, 3-D offsets
        (lambda n: lap2d_fd(n), 40, 4, 256),  # N=1600
        (lambda n: lap2d_fd(n), 90, 8, 512),  # offset < cols (q=0 path)
    ],
)
def test_dia_matvec_stream2d(rng, make, n, rows, cols):
    dia = make(n)
    x = rng.standard_normal(dia.shape[0])
    got = np.asarray(
        dia_matvec_stream2d(
            jnp.asarray(dia.bands),
            jnp.asarray(x),
            offsets=tuple(dia.offsets),
            rows=rows,
            cols=cols,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, dia.mat_vec(x), rtol=1e-12)


@pytest.mark.parametrize(
    "make,n,block",
    [
        (lap2d_reference, 500, 256),  # 2 blocks, ragged tail
        (lambda n: lap2d_fd(n), 33, 256),  # N=1089, off-grid tail
        (lambda n: lap3d_fd(n), 7, 128),  # N=343, 3-D offsets
        (lambda n: lap2d_fd(n), 40, 1600),  # single exact block
    ],
)
def test_banded_matvec_blocked(rng, make, n, block):
    from cgx.solver.operators import banded_matvec, banded_matvec_blocked

    dia = make(n)
    x = rng.standard_normal(dia.shape[0])
    bands, offs = jnp.asarray(dia.bands), tuple(dia.offsets)
    got = np.asarray(banded_matvec_blocked(bands, offs, jnp.asarray(x), block=block))
    np.testing.assert_allclose(got, dia.mat_vec(x), rtol=1e-12)
    flat = np.asarray(banded_matvec(bands, offs, jnp.asarray(x)))
    np.testing.assert_allclose(got, flat, rtol=1e-12)


def test_dia_matvec_stream_matches_resident(rng):
    """Streaming and resident kernels agree bit for bit (fp32)."""
    dia = lap2d_fd(40)  # N=1600
    bands = jnp.asarray(np.asarray(dia.bands, np.float32))
    x = jnp.asarray(rng.standard_normal(dia.shape[0]).astype(np.float32))
    offs = tuple(dia.offsets)
    a = dia_matvec(bands, x, offsets=offs, block=256, interpret=True)
    b = dia_matvec_stream(bands, x, offsets=offs, block=256, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dia_matvec_dot(rng):
    dia = lap2d_reference(700)
    x = rng.standard_normal(700)
    y, d = dia_matvec_dot(
        jnp.asarray(dia.bands),
        jnp.asarray(x),
        offsets=tuple(dia.offsets),
        block=256,
        interpret=True,
    )
    want_y = dia.mat_vec(x)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-13)
    np.testing.assert_allclose(float(d), x @ want_y, rtol=1e-12)


def test_fused_update_rs(rng):
    n = 1000
    x, p, r, ap = (rng.standard_normal(n) for _ in range(4))
    alpha = jnp.asarray(0.37)
    xo, ro, rs = fused_update_rs(
        jnp.asarray(x), jnp.asarray(p), jnp.asarray(r), jnp.asarray(ap), alpha,
        block=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(xo), x + 0.37 * p, rtol=1e-14)
    r_new = r - 0.37 * ap
    np.testing.assert_allclose(np.asarray(ro), r_new, rtol=1e-14)
    np.testing.assert_allclose(float(rs), r_new @ r_new, rtol=1e-12)


def test_fused_axpby(rng):
    n = 777
    a, b = rng.standard_normal(n), rng.standard_normal(n)
    out = fused_axpby(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(2.5), jnp.asarray(-1.5),
        block=256, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), 2.5 * a - 1.5 * b, rtol=1e-13)


# --- grid-aware banded operator (round 2) -----------------------------


def test_grid_dia_operator_matches_flat():
    """GridDiaOperator's per-axis-shift mat-vec must be bit-identical
    to the flat banded product for the grid-stencil families — 2-D,
    3-D, and a widened Galerkin coarse level."""
    import numpy as np

    from cgx.mats.generators import lap2d_fd, lap3d_fd
    from cgx.solver.multigrid import _galerkin_bilinear
    from cgx.solver.operators import DiaOperator, GridDiaOperator

    cases = [lap2d_fd(32), lap3d_fd(8), _galerkin_bilinear(lap2d_fd(32), 32, 2)]
    rs = np.random.default_rng(0)
    for dia in cases:
        flat = DiaOperator.from_host(dia)
        grid = GridDiaOperator.from_host(dia)
        assert isinstance(grid, DiaOperator)  # all isinstance gates hold
        x = jnp.asarray(rs.standard_normal(dia.shape[0]))
        np.testing.assert_array_equal(
            np.asarray(grid.matvec(x)), np.asarray(flat.matvec(x))
        )


def test_grid_dia_operator_refuses_wrapping_stencil():
    """lap2d_reference's quasi-stencil has nonzero band values at
    row-wrapping positions: per-axis shifts would change the product,
    so construction must refuse and as_operator must fall back."""
    import pytest

    from cgx.mats.generators import lap2d_reference
    from cgx.solver.operators import (
        DiaOperator,
        GridDiaOperator,
        as_operator,
    )

    dia = lap2d_reference(256)
    with pytest.raises(ValueError, match="wrap"):
        GridDiaOperator.from_host(dia)
    op = as_operator(dia)
    assert type(op) is DiaOperator


def test_grid_dia_operator_solve_golden_unchanged():
    """The grid operator's mat-vec is bit-identical to the flat one,
    so a cg_solve through it (which runs the whole loop grid-shaped)
    reproduces the pinned golden iteration count exactly."""
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.operators import GridDiaOperator

    dia = lap2d_fd(32)
    op = GridDiaOperator.from_host(dia)
    b = jnp.asarray(source_term(1024))
    res = cg_solve(op, b, tol=1e-6)
    assert int(res.iterations) == 119  # test_golden.py's pinned value
