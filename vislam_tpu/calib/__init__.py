from vislam_tpu.calib.camera_model import (
    CameraCalib,
    project_points,
    unproject_pixels,
    distort_normalized,
    undistort_normalized,
    compute_undistort_maps,
    remap_bilinear,
    undistort_image,
    scale_calib,
)
from vislam_tpu.calib.presets import euroc_calib, kitti_calib, tum_calib, load_opencv_xml

__all__ = [
    "CameraCalib",
    "project_points",
    "unproject_pixels",
    "distort_normalized",
    "undistort_normalized",
    "compute_undistort_maps",
    "remap_bilinear",
    "undistort_image",
    "scale_calib",
    "euroc_calib",
    "kitti_calib",
    "tum_calib",
    "load_opencv_xml",
]
