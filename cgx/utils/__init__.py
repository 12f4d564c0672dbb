from cgx.utils.checkpoint import (
    CGCheckpoint,
    cg_solve_resumable,
    sharded_cg_solve_resumable,
)
from cgx.utils.records import SolveRecord
from cgx.utils.timer import PhaseTimer, trace
