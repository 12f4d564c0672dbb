"""Test configuration: 8 virtual CPU devices + fp64.

The reference could only test its distributed path on a real SLURM
cluster (SURVEY §4); here the same Mesh/shard_map code runs on fake
CPU devices, so every distributed test runs in CI on one host.
"""

import os

# Must be set before jax initializes its backends. The environment may
# pin JAX_PLATFORMS to a hardware plugin (e.g. a tunneled TPU), so we
# additionally override via jax.config below — compiling the test suite
# through a remote TPU tunnel is both slow and unnecessary.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The XLA:CPU JIT segfaults (deterministically, 3/3 runs) inside
# backend_compile_and_load on the ~500th test's compile once the whole
# suite's executables have accumulated in-process; either half of the
# suite (327 or 190 tests) plus the same crashing test passes cleanly,
# so it is cumulative compiler-resource exhaustion, not any single
# program (round-4 session 2, /tmp/full_suite*.log). Dropping the
# executable caches every 100 tests keeps the live set far below the
# measured-safe 327 at the cost of a few recompiles.
_TESTS_SINCE_CLEAR = {"n": 0}


@pytest.fixture(autouse=True)
def _bound_xla_cpu_jit_memory():
    yield
    _TESTS_SINCE_CLEAR["n"] += 1
    if _TESTS_SINCE_CLEAR["n"] >= 100:
        _TESTS_SINCE_CLEAR["n"] = 0
        jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_spd(n: int, seed: int = 0) -> np.ndarray:
    """Random well-conditioned SPD matrix for oracle tests."""
    rs = np.random.default_rng(seed)
    q = rs.standard_normal((n, n))
    return q @ q.T + n * np.eye(n)


@pytest.fixture
def spd64():
    return make_spd(64)
