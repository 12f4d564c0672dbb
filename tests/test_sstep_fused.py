"""Sharded fused streaming s-step CG (cgx/parallel/sstep_fused.py).

The fused two-kernel s-step block (cgx.ops.sstep_stream) run per shard
under the deep-halo collective pattern: 2 ppermutes + 1 Gram psum per
s iterations. Interpret-mode Pallas on the 8-device virtual CPU mesh
(conftest), mirroring how the stream2d local kernel is covered.

Reference anchor: the distributed solver IS the reference's core
deliverable (/root/reference/code/MPI/cg.cc:100-140); the fused path
keeps its quality gate semantics (true-residual check, cg.cc:144-154)
while collapsing its per-iteration 2-psum + halo pattern to one
reduction per s iterations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.mats.generators import lap2d_fd
from cgx.parallel.sharded_cg import make_mesh, sharded_cg_solve
from cgx.parallel.sstep_fused import fused_plane_geometry
from cgx.utils import collectives as C

G = 128
N = G * G


@pytest.fixture(scope="module")
def dia():
    return lap2d_fd(G)


@pytest.fixture(scope="module")
def b32():
    rng = np.random.default_rng(11)
    return rng.standard_normal(N).astype(np.float32)


def _true_rel(mat, x, b):
    bands = np.asarray(mat.bands, np.float64)
    n = bands.shape[1]
    x = np.asarray(x, np.float64)
    y = np.zeros(n)
    for k, off in enumerate(mat.offsets):
        off = int(off)
        if off >= 0:
            sl = slice(0, n - off) if off else slice(0, n)
            y[sl] += bands[k, sl] * x[off:]
        else:
            y[-off:] += bands[k, -off:] * x[:off]
    r = np.asarray(b, np.float64) - y
    return float(np.linalg.norm(r) / np.linalg.norm(b))


# --- geometry picker ----------------------------------------------------


def test_geometry_valid_pick():
    offs = (-G, -1, 0, 1, G)
    # 4 shards of N=16384 -> n_loc=4096, f32 planes
    rows, cols, pm = fused_plane_geometry(offs, 4, 4096, jnp.float32)
    assert 4096 % (rows * cols) == 0
    assert rows >= pm
    assert pm * cols <= 4096
    assert rows % 8 == 0 and cols % 128 == 0


def test_geometry_bf16_alignment_is_taller():
    offs = (-G, -1, 0, 1, G)
    _, _, pm32 = fused_plane_geometry(offs, 4, 4096, jnp.float32)
    rows, cols, pm16 = fused_plane_geometry(
        offs, 4, 4096, jnp.float32, jnp.bfloat16
    )
    # bf16 sublane tile (16) rounds the margins up
    assert pm16 >= pm32
    assert rows % 16 == 0


def test_geometry_raises_when_untileable():
    offs = (-G, -1, 0, 1, G)
    # 8 shards of N=16384 -> n_loc=2048: the bf16 halo cannot fit
    with pytest.raises(ValueError, match="fused"):
        fused_plane_geometry(offs, 4, 2048, jnp.float32, jnp.bfloat16)


# --- solves on the virtual mesh ------------------------------------------


def test_fused_f32_planes_quality(dia, b32):
    """4 shards, full-width f32 band planes: converges and passes the
    reference's true-residual quality gate at the fp32 floor."""
    res = sharded_cg_solve(
        dia, b32, n_devices=4, method="sstep", sstep_s=4,
        sstep_powers="fused", sstep_bands_dtype=None, tol=1e-3,
    )
    assert bool(res.converged)
    assert not bool(res.breakdown)
    assert _true_rel(dia, res.x, b32) < 1e-3


def test_fused_bf16_auto_resolution_and_quality(dia, b32):
    """'auto' resolves to explicit bf16 for the bf16-exact lap2d bands
    (bitwise-equal solve — same program), and the narrowed solve
    matches full-width planes to rounding: the band VALUES are
    identical (the kernels widen on load), but the bf16 sublane tile
    (16 rows) changes the plane geometry, which reorders the Gram
    accumulation — trajectories agree to rounding, not bitwise."""
    kw = dict(
        n_devices=4, method="sstep", sstep_s=4,
        sstep_powers="fused", tol=1e-3,
    )
    r16 = sharded_cg_solve(dia, b32, sstep_bands_dtype="auto", **kw)
    rex = sharded_cg_solve(
        dia, b32, sstep_bands_dtype=jnp.bfloat16, **kw
    )
    assert int(r16.iterations) == int(rex.iterations)
    np.testing.assert_array_equal(np.asarray(r16.x), np.asarray(rex.x))

    r32 = sharded_cg_solve(dia, b32, sstep_bands_dtype=None, **kw)
    assert abs(int(r16.iterations) - int(r32.iterations)) <= 4
    assert bool(r16.converged) and bool(r32.converged)
    assert _true_rel(dia, r16.x, b32) < 1e-3
    assert _true_rel(dia, r32.x, b32) < 1e-3


def test_fused_matches_deephalo_iterations(dia, b32):
    """Same s-step method, two basis engines: the fused block and the
    deephalo XLA build must land within one block of each other (the
    Gram differs only by accumulation order)."""
    kw = dict(n_devices=4, method="sstep", sstep_s=4, tol=1e-3)
    rf = sharded_cg_solve(
        dia, b32, sstep_powers="fused", sstep_bands_dtype=None, **kw
    )
    rd = sharded_cg_solve(dia, b32, sstep_powers="deephalo", **kw)
    assert bool(rf.converged) and bool(rd.converged)
    assert abs(int(rf.iterations) - int(rd.iterations)) <= 4


def test_fused_warm_start_and_zero_rhs(dia, b32):
    kw = dict(
        n_devices=4, method="sstep", sstep_s=4,
        sstep_powers="fused", sstep_bands_dtype=None, tol=1e-3,
    )
    r1 = sharded_cg_solve(dia, b32, **kw)
    r2 = sharded_cg_solve(dia, b32, x0=np.asarray(r1.x), **kw)
    assert int(r2.iterations) <= 4  # one block at most from a solution
    rz = sharded_cg_solve(dia, np.zeros(N, np.float32), **kw)
    assert int(rz.iterations) == 0
    np.testing.assert_array_equal(np.asarray(rz.x), 0)


def test_fused_rejects_replace_every(dia):
    """ADVICE r4: an explicit residual-replacement cadence with the
    fused block (which has no replacement hook) must raise, not be
    silently dropped."""
    with pytest.raises(ValueError, match="sstep_replace_every"):
        sharded_cg_solve(
            dia, np.ones(N, np.float32), n_devices=2, method="sstep",
            sstep_s=4, sstep_powers="fused", sstep_replace_every=1,
            tol=1e-3,
        )
    with pytest.raises(ValueError, match="sstep_s <= 8"):
        sharded_cg_solve(
            dia, np.ones(N, np.float32), n_devices=2, method="sstep",
            sstep_s=12, sstep_powers="fused", tol=1e-3,
        )


def test_bands_dtype_rejected_off_fused(dia):
    """ADVICE r4: sstep_bands_dtype is consumed only by the fused
    path; an explicit dtype anywhere else must raise."""
    with pytest.raises(ValueError, match="sstep_bands_dtype"):
        sharded_cg_solve(
            dia, np.ones(N, np.float32), n_devices=2, method="sstep",
            sstep_s=4, sstep_powers="deephalo",
            sstep_bands_dtype=jnp.bfloat16, tol=1e-3,
        )
    with pytest.raises(ValueError, match="sstep_bands_dtype"):
        sharded_cg_solve(
            dia, np.ones(N, np.float32), n_devices=2,
            method="reference", sstep_bands_dtype=jnp.bfloat16,
            tol=1e-3,
        )


def test_fused_rejects_untileable_build(dia):
    with pytest.raises(ValueError, match="fused"):
        # 8 shards + bf16 margins: no valid tiling at this size
        sharded_cg_solve(
            dia, np.ones(N, np.float32), n_devices=8, method="sstep",
            sstep_s=4, sstep_powers="fused",
            sstep_bands_dtype=jnp.bfloat16, tol=1e-3,
        )


# --- collective signature -------------------------------------------------


def test_fused_collective_signature(dia):
    """Per s-block: exactly 2 ppermutes (stacked p/r edges per
    direction) + 1 psum (the (2, m, m) Gram pair). Setup: 2 band
    ppermutes + 2 x0 ppermutes + 1 pmax (pow2 prescale) + 1 psum
    (||r0||^2). Pinned so a refactor cannot silently add latency."""
    from cgx.parallel.sharded_cg import make_sharded_solver

    solver = make_sharded_solver(
        dia, N, dtype=np.float32, n_devices=4, method="sstep",
        sstep_s=4, sstep_powers="fused", sstep_bands_dtype=None,
    )
    b = np.ones(N, np.float32)
    with C.capture() as cap:
        solver.solve(b)
    sig = cap.signature()
    iter_prims = [(p, w) for (p, w, _) in sig["iter"]]
    assert iter_prims.count(("ppermute", 1)) == 2
    assert iter_prims.count(("psum", 1)) == 1
    # nothing else rides in the block loop
    assert len(sig["iter"]) == 3
    setup_prims = [p for (p, _, _) in sig["setup"]]
    assert setup_prims.count("ppermute") == 4
    assert setup_prims.count("psum") >= 1  # ||r0||^2 (+ pmax may
    #                                        classify as psum variant)


def test_solve_api_routes_fused_on_mesh(dia, b32):
    """cgx.solve(mesh-sharded) accepts sstep_powers='fused' and routes
    it to the sharded fused block (api._sharded_powers pass-through)."""
    import cgx
    from cgx.config import SolveConfig

    mesh = make_mesh(4)
    cfg = SolveConfig(
        method="sstep", sstep_s=4, sstep_powers="fused",
        precision="fp32", tolerance=1e-3,
    )
    res = cgx.solve(dia, b32, cfg, mesh=mesh)
    assert bool(res.converged)
    assert _true_rel(dia, res.x, b32) < 1e-3


def test_sharded_sstep_fallback_plumbing(dia, b32, monkeypatch):
    """sstep_fallback='auto': a breakdown-frozen unconverged s-step
    result is finished by the reference recurrence warm-started from
    the frozen iterate (exact shift identity), with iteration counts
    composed — mirroring the single-device sstep_cg_solve fallback."""
    import cgx.parallel.sharded_cg as sc

    real_solve = sc.ShardedCGSolver.solve
    calls = {"n": 0}

    def fake_solve(self, b, x0=None, **kw):
        calls["n"] += 1
        res = real_solve(self, b, x0=x0, **kw)
        if calls["n"] == 1:
            # simulate a rank-collapse freeze 8 iterations in: a valid
            # (non-solution) iterate with breakdown flagged
            import jax.numpy as jnp

            return res._replace(
                breakdown=jnp.asarray(True),
                converged=jnp.asarray(False),
                iterations=jnp.asarray(8, jnp.int32),
            )
        return res

    monkeypatch.setattr(sc.ShardedCGSolver, "solve", fake_solve)
    res = sc.sharded_cg_solve(
        dia, b32, n_devices=4, method="sstep", sstep_s=4,
        sstep_powers="fused", sstep_bands_dtype=None, tol=1e-3,
    )
    assert calls["n"] == 2  # fallback actually ran
    assert bool(res.converged)
    assert int(res.iterations) > 8  # composed count
    assert _true_rel(dia, res.x, b32) < 1e-3


def test_sharded_sstep_fallback_off_returns_frozen(dia, b32, monkeypatch):
    import cgx.parallel.sharded_cg as sc

    real_solve = sc.ShardedCGSolver.solve

    def fake_solve(self, b, x0=None, **kw):
        import jax.numpy as jnp

        res = real_solve(self, b, x0=x0, **kw)
        return res._replace(
            breakdown=jnp.asarray(True), converged=jnp.asarray(False)
        )

    monkeypatch.setattr(sc.ShardedCGSolver, "solve", fake_solve)
    res = sc.sharded_cg_solve(
        dia, b32, n_devices=4, method="sstep", sstep_s=4,
        sstep_fallback="off", tol=1e-3,
    )
    assert bool(res.breakdown) and not bool(res.converged)


def test_sharded_sstep_fallback_adaptive_ladder(dia, b32, monkeypatch):
    """sstep_fallback='adaptive': the first breakdown restarts the
    SHARDED s-step at s//2 (keeping the one-Gram-psum-per-s
    economics), and only an s=2 breakdown drops to the reference
    recurrence. Breakdowns are forged on every sstep solve, so the
    expected build ladder is s=4 -> s=2 -> reference."""
    import cgx.parallel.sharded_cg as sc

    real_solve = sc.ShardedCGSolver.solve
    real_make = sc.make_sharded_solver
    ladder = []

    def spy_make(mat, n, **kw):
        ladder.append((kw.get("method"), kw.get("sstep_s")))
        return real_make(mat, n, **kw)

    def fake_solve(self, b, x0=None, **kw):
        res = real_solve(self, b, x0=x0, **kw)
        if ladder[-1][0] == "sstep":
            import jax.numpy as jnp

            return res._replace(
                breakdown=jnp.asarray(True),
                converged=jnp.asarray(False),
                iterations=jnp.asarray(4, jnp.int32),
            )
        return res

    monkeypatch.setattr(sc.ShardedCGSolver, "solve", fake_solve)
    monkeypatch.setattr(sc, "make_sharded_solver", spy_make)
    res = sc.sharded_cg_solve(
        dia, b32, n_devices=4, method="sstep", sstep_s=4,
        sstep_powers="fused", sstep_bands_dtype=None, tol=1e-3,
        sstep_fallback="adaptive",
    )
    assert [(m, s) for m, s in ladder] == [
        ("sstep", 4), ("sstep", 2), ("reference", None)
    ]
    assert bool(res.converged)
    # composed count: 4 (forged s=4 freeze) + 4 (forged s=2 freeze)
    # + reference tail (>= 0: the underlying real solves progress)
    assert int(res.iterations) >= 8
    assert _true_rel(dia, res.x, b32) < 1e-3
