from vislam_tpu.backend.triangulate import triangulate_midpoint, triangulate_dlt
from vislam_tpu.backend.ba import (
    BAProblem,
    BAState,
    bundle_adjust,
    reprojection_residuals,
    build_normal_equations,
    schur_solve,
)

__all__ = [
    "triangulate_midpoint",
    "triangulate_dlt",
    "BAProblem",
    "BAState",
    "bundle_adjust",
    "reprojection_residuals",
    "build_normal_equations",
    "schur_solve",
]
