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
    lap2d_aniso,
    lap2d_fd,
    lap2d_reference,
    lap3d_fd,
    poisson2d_var,
    poisson3d_var,
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

from cgx.ops.cg_kernel import dia_cg_solve_vmem
from cgx.ops.ozaki import OzakiDenseOperator, ozaki_matvec
from cgx.parallel.mesh import make_mesh
from cgx.parallel.sharded_cg import (
    sharded_block_cg_solve,
    sharded_block_deflated_cg_solve,
    ShardedCGSolver,
    make_sharded_solver,
    sharded_cg_solve,
    sharded_cg_solve_harvest,
    sharded_deflated_cg_solve,
    sharded_refine_fixed_sweeps,
)
from cgx.solver.batched import cg_solve_batched
from cgx.solver.fast import dia_cg_solve_pallas
from cgx.solver.gvpipe import gv_cg_solve
from cgx.solver.pipelined import pipelined_cg_solve
from cgx.solver.precond import block_jacobi, jacobi, neumann_banded
from cgx.solver.refine import (
    iterative_refinement,
    refine_fixed_sweeps,
    refine_pcg_sweeps,
    refine_pcg_sweeps_dd,
    refine_pcg_sweeps_tw,
)
from cgx.utils.checkpoint import (
    CGCheckpoint,
    cg_solve_resumable,
    sharded_cg_solve_resumable,
)
from cgx.utils.records import SolveRecord
from cgx.utils.timer import PhaseTimer
from cgx.solver.autodiff import cg_solve_differentiable
from cgx.solver.api import solve, solve_sequence
from cgx.parallel.batched2d import make_mesh2d, sharded_cg_solve_batched
from cgx.solver.chebyshev import (
    chebyshev_solve,
    gershgorin_bounds,
    host_spectral_bounds,
    lanczos_bounds,
    spectral_bounds,
)
from cgx.solver.sstep import sstep_cg_solve
from cgx.solver.blockcg import (
    BlockCGResult,
    block_cg_solve,
    block_deflated_cg_solve,
)
from cgx.solver.deflated import (
    DeflationBasis,
    cg_solve_harvest,
    deflated_cg_solve,
    lanczos_ritz,
)
from cgx.solver.multigrid import MGPreconditioner, mg_preconditioner
from cgx.parallel.mg_sharded import (
    sharded_mg_block_cg_solve,
    sharded_mg_cg_solve,
)
