from deepcharuco_tpu.pnp.projection import (
    rodrigues,
    rodrigues_inverse,
    distort,
    undistort_normalize,
    project_points,
)
from deepcharuco_tpu.pnp.solve import solve_pnp, solve_pnp_batch

__all__ = [
    "rodrigues",
    "rodrigues_inverse",
    "distort",
    "undistort_normalize",
    "project_points",
    "solve_pnp",
    "solve_pnp_batch",
]
