"""Unit tests for small public helpers that the integration suites
exercise only indirectly (or not at all): mesh sharding constructors,
config dtype default, reduce.norm2, and the slope-harness utilities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from cgx.parallel.mesh import (
    band_sharding,
    col_sharding,
    make_mesh,
    replicated,
    row_sharding,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharding_helpers_specs(mesh):
    assert row_sharding(mesh).spec == P("rows")
    assert row_sharding(mesh, ndim=2).spec == P("rows", None)
    assert col_sharding(mesh).spec == P(None, "rows")
    assert band_sharding(mesh).spec == P(None, "rows")
    assert replicated(mesh).spec == P()


def test_sharding_helpers_place_arrays(mesh):
    x = jax.device_put(np.zeros((16, 4)), row_sharding(mesh, ndim=2))
    assert x.sharding.spec == P("rows", None)
    bands = jax.device_put(np.zeros((5, 16)), band_sharding(mesh))
    # each device holds the full diagonal axis, 1/8 of the columns
    assert bands.addressable_shards[0].data.shape == (5, 2)


def test_default_dtype_tracks_x64():
    from cgx.config import default_dtype

    assert jax.config.jax_enable_x64
    assert default_dtype() == jnp.float64


def test_norm2_matches_numpy():
    from cgx.ops.reduce import norm2

    v = jnp.asarray(np.random.default_rng(0).standard_normal(257))
    np.testing.assert_allclose(
        float(norm2(v)), np.linalg.norm(np.asarray(v)), rtol=1e-12
    )


def test_time_call_returns_elapsed():
    from cgx.bench.slope import time_call

    t = time_call(lambda: sum(range(1000)))
    assert t >= 0.0


def test_measure_dense_cg_xla_smoke():
    """The dense slope harness runs end-to-end on CPU (xla kernel,
    tiny sizes) and reports the documented keys."""
    from cgx.bench.slope import measure_dense_cg
    from cgx.mats.generators import lap2d_fd

    a = np.asarray(lap2d_fd(8).to_dense())  # 64x64 SPD
    out = measure_dense_cg(
        a, dtype="float32", kernel="xla", ks=(5, 10, 15), reps=2
    )
    for key in ("s_per_iter", "floor", "fit_rel_err"):
        assert key in out, out.keys()
    # the slope itself is noise at this size on a loaded CPU host —
    # structural checks only (the harness's fit math has its own
    # virtual-clock tests in tests/test_slope.py)
    assert np.isfinite(out["s_per_iter"])
    with pytest.raises(ValueError, match="unknown kernel"):
        measure_dense_cg(a, kernel="cuda")
