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
    lap2d_fd_coo_lower,
    lap2d_reference,
    lap3d_fd,
    source_term,
)
