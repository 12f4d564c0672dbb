from cgx.solver.api import solve
from cgx.solver.autodiff import cg_solve_differentiable
from cgx.solver.batched import cg_solve_batched
from cgx.solver.cg import CGResult, cg_solve
from cgx.solver.fast import dia_cg_solve_pallas
from cgx.solver.operators import (
    CsrOperator,
    DenseOperator,
    DiaOperator,
    EllOperator,
    as_operator,
)
from cgx.solver.pipelined import pipelined_cg_solve
from cgx.solver.precond import jacobi, neumann_banded
from cgx.solver.refine import (
    iterative_refinement,
    refine_fixed_sweeps,
    refine_pcg_sweeps,
    refine_pcg_sweeps_dd,
    refine_pcg_sweeps_tw,
)
from cgx.solver.chebyshev import (
    chebyshev_solve,
    gershgorin_bounds,
    host_spectral_bounds,
    lanczos_bounds,
    spectral_bounds,
)
from cgx.solver.sstep import sstep_cg_solve
from cgx.solver.blockcg import BlockCGResult, block_cg_solve
from cgx.solver.deflated import (
    DeflationBasis,
    cg_solve_harvest,
    deflated_cg_solve,
    lanczos_ritz,
)
from cgx.solver.multigrid import MGPreconditioner, mg_preconditioner
