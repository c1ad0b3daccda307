from vislam_tpu.parallel.mesh import make_mesh, device_count
from vislam_tpu.parallel.dist_ba import (
    dist_bundle_adjust,
    dist_vi_bundle_adjust,
    shard_problem,
)

__all__ = [
    "make_mesh",
    "device_count",
    "dist_bundle_adjust",
    "dist_vi_bundle_adjust",
    "shard_problem",
]
