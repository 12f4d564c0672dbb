from cgx.bench.analysis import (
    REFERENCE_ALPHAS,
    ScalingTable,
    amdahl_bound,
    fit_alpha,
    group_ladders,
    gustafson_bound,
    weak_efficiency,
)
from cgx.bench.sweeps import kernel_sweep, strong_scaling, weak_scaling
from cgx.bench.autotune import (
    autotune_dense_tiles,
    tuned_tiles,
)
