from vislam_tpu.eval.metrics import ate_rmse, rpe_rmse, umeyama_alignment
from vislam_tpu.eval.traj_io import (
    write_trajectory_csv,
    read_trajectory_csv,
    write_trajectory_tum,
    read_trajectory_tum,
)
from vislam_tpu.eval.runner import run_vio_sequence
from vislam_tpu.eval.smooth import smooth_bootstrap_prefix

__all__ = [
    "ate_rmse",
    "rpe_rmse",
    "umeyama_alignment",
    "write_trajectory_csv",
    "read_trajectory_csv",
    "write_trajectory_tum",
    "read_trajectory_tum",
    "run_vio_sequence",
    "smooth_bootstrap_prefix",
]
