"""Parity of the device-side problem builders (cgx.mats.device) with
the host generators they mirror."""

import jax.numpy as jnp
import numpy as np

from cgx.mats.device import (
    lap2d_operator, lap3d_operator, source_term_device,
)
from cgx.mats.generators import lap2d_fd, lap3d_fd, source_term


def test_lap2d_bands_bitwise():
    g = 37
    host = lap2d_fd(g)
    op = lap2d_operator(g, jnp.float64)
    assert tuple(op.offsets) == tuple(host.offsets)
    np.testing.assert_array_equal(np.asarray(op.bands), host.bands)


def test_lap2d_bands_fp32():
    g = 12
    host = lap2d_fd(g)
    op = lap2d_operator(g, jnp.float32)
    assert op.bands.dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(op.bands), host.bands.astype(np.float32)
    )


def test_lap3d_bands_bitwise():
    g = 9
    host = lap3d_fd(g)
    op = lap3d_operator(g, jnp.float64)
    assert tuple(op.offsets) == tuple(host.offsets)
    np.testing.assert_array_equal(np.asarray(op.bands), host.bands)


def test_source_term_parity():
    n = 10_000
    host = source_term(n)
    dev = np.asarray(source_term_device(n, jnp.float64))
    # device sin may differ from libm by ~1 ulp; the values reach ~2e5
    np.testing.assert_allclose(dev, host, rtol=1e-14, atol=1e-9)
