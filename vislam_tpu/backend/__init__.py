from vislam_tpu.backend.triangulate import triangulate_midpoint, triangulate_dlt
from vislam_tpu.backend.ba import (
    BAProblem,
    BAState,
    bundle_adjust,
    reprojection_residuals,
    build_normal_equations,
    schur_solve,
)
from vislam_tpu.backend.photometric import photometric_align, PhotoResult
from vislam_tpu.backend.pose_graph import (
    PoseGraph,
    optimize_pose_graph,
    pose_graph_residuals,
    odometry_edges,
)
from vislam_tpu.backend.loop import (
    global_descriptors,
    detect_loop_candidates,
    verify_loop,
)
from vislam_tpu.backend.pnp import pnp_gn, PnPResult
from vislam_tpu.backend.sim3_graph import (
    Sim3Graph,
    optimize_sim3_graph,
    sim3_graph_residuals,
    sim3_odometry_edges,
)
from vislam_tpu.backend.trajectory_opt import KeyframeRecord, correct_trajectory

__all__ = [
    "triangulate_midpoint",
    "triangulate_dlt",
    "BAProblem",
    "BAState",
    "bundle_adjust",
    "reprojection_residuals",
    "build_normal_equations",
    "schur_solve",
    "photometric_align",
    "PhotoResult",
    "PoseGraph",
    "optimize_pose_graph",
    "pose_graph_residuals",
    "odometry_edges",
    "global_descriptors",
    "detect_loop_candidates",
    "verify_loop",
    "pnp_gn",
    "Sim3Graph",
    "optimize_sim3_graph",
    "sim3_graph_residuals",
    "sim3_odometry_edges",
    "PnPResult",
    "KeyframeRecord",
    "correct_trajectory",
]
