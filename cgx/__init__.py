"""cgx — a TPU-native conjugate-gradient solver framework.

Built from scratch in JAX (XLA / Pallas / shard_map) with the
capabilities of the reference project federicobetti99/Conjugate-Gradient
(see SURVEY.md for the structural map)."""

from cgx.config import DEFAULT_TOLERANCE, NEARZERO, SolveConfig, enable_x64
from cgx.mats.containers import (
    COOMatrix,
    CSRMatrix,
    DenseMatrix,
    DIAMatrix,
    ELLMatrix,
)
from cgx.mats.generators import (
    lap2d_fd,
    lap2d_reference,
    lap3d_fd,
    source_term,
)
from cgx.solver.cg import CGResult, cg_solve
from cgx.solver.operators import (
    CsrOperator,
    DenseOperator,
    DiaOperator,
    EllOperator,
    as_operator,
)

__version__ = "0.1.0"
