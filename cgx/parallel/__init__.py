from cgx.parallel.mesh import ROWS_AXIS, make_mesh
from cgx.parallel.multihost import global_mesh, initialize_from_env, is_multihost
from cgx.parallel.partition import padded_size, partition
from cgx.parallel.sharded_cg import (
    sharded_block_cg_solve,
    sharded_block_deflated_cg_solve,
    ShardedCGSolver,
    make_sharded_solver,
    sharded_cg_solve,
    sharded_deflated_cg_solve,
    sharded_refine_fixed_sweeps,
)
from cgx.parallel.batched2d import make_mesh2d, sharded_cg_solve_batched
from cgx.parallel.mg_sharded import (
    sharded_mg_block_cg_solve,
    sharded_mg_cg_solve,
)
