"""Device-mesh builders.

The reference's process world is ``MPI_COMM_WORLD`` sized by
``srun -n p`` (cg.run:17). Here a 1-D :class:`jax.sharding.Mesh` over
the ``rows`` axis plays that role; multi-host meshes come from the same
API after ``jax.distributed.initialize`` (SURVEY §2.5) — the code below
is topology-agnostic.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"


def make_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = ROWS_AXIS,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 1-D mesh over ``n_devices`` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def row_sharding(mesh: Mesh, ndim: int = 1, axis_name: str = ROWS_AXIS) -> NamedSharding:
    """Shard the leading (row) dimension; replicate the rest."""
    spec = [axis_name] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def col_sharding(mesh: Mesh, axis_name: str = ROWS_AXIS) -> NamedSharding:
    """Shard the second (column) dimension of a 2-D array."""
    return NamedSharding(mesh, P(None, axis_name))


def band_sharding(mesh: Mesh, axis_name: str = ROWS_AXIS) -> NamedSharding:
    """DIA bands (ndiag, n): replicate the small diagonal axis, shard n."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
