"""Multi-host (multi-process) mesh support.

The reference scales across nodes with SLURM + mvapich2 (`srun -n p`,
MPI/cg.run:17); its inter-node cliff at p > 36 is visible in the
strong-scaling data (strong_scaling.txt:28, the plots.ipynb p=36
marker). The JAX equivalent is one call per process to
``jax.distributed.initialize`` after which ``jax.devices()`` spans all
hosts and the SAME ``Mesh``/``shard_map`` solver code runs unchanged —
XLA routes collectives over ICI within a slice and DCN across slices.

Nothing else in cgx is multi-host-aware by design: build the mesh with
:func:`global_mesh` instead of :func:`cgx.parallel.mesh.make_mesh` and
pass it to :func:`cgx.parallel.sharded_cg.sharded_cg_solve`.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from cgx.parallel.mesh import ROWS_AXIS


def initialize_from_env(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime.

    With no arguments, auto-detects from the environment (works under
    SLURM — the reference's launcher — plus GKE/Cloud TPU metadata).
    Explicit arguments mirror ``jax.distributed.initialize``. Safe to
    call once per process before any computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif "SLURM_PROCID" in os.environ and coordinator_address is not None:
        kwargs["process_id"] = int(os.environ["SLURM_PROCID"])
    jax.distributed.initialize(**kwargs)


def global_mesh(axis_name: str = ROWS_AXIS) -> Mesh:
    """1-D mesh over every device of every participating process."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_local_rows(n: int, mesh: Mesh) -> tuple[int, int]:
    """(start, count) of the global row range this process's shards
    cover — the analogue of the reference's per-rank
    (start_rows[prank], num_rows[prank]) (cg.cc:236-268)."""
    total = mesh.devices.size
    per = -(-n // total)
    local = [d for d in mesh.devices.flat if d.process_index == jax.process_index()]
    if not local:
        return (0, 0)
    idxs = sorted(
        np.flatnonzero(
            np.fromiter(
                (d.process_index == jax.process_index() for d in mesh.devices.flat),
                dtype=bool,
            )
        )
    )
    start = int(idxs[0]) * per
    count = min(len(idxs) * per, max(0, n - start))
    return (start, count)
