from cgx.ops.axpy import fused_axpby, fused_update_rs
from cgx.ops.dia_spmv import dia_matvec, dia_matvec_dot
from cgx.ops.matvec import dense_matvec, dense_matvec_dot
from cgx.ops.ozaki import OzakiDenseOperator, ozaki_matvec
from cgx.ops.reduce import norm2, vdot

# NOTE: cgx.ops.cg_kernel depends on cgx.solver (CGResult) and is not
# re-exported here to keep the package import graph acyclic; use
# `cgx.dia_cg_solve_vmem` or import cgx.ops.cg_kernel directly.
