"""Calibration presets for the datasets the reference ships configs for.

Role of /root/reference/calibration/{calibrationEUROC,calibrationKitti,
calibrationTUM}.xml. Values are the standard public sensor calibrations of
each dataset (EUROC MAV cam0 sensor.yaml, KITTI odometry gray seq 00-02
rectified P0, TUM RGB-D fr1), which is what those XMLs record.

Also provides an OpenCV-XML loader so existing reference-style calibration
files keep working.
"""

from __future__ import annotations

import numpy as np

from vislam_tpu.calib.camera_model import CameraCalib

# EUROC MAV cam0 <-> body (IMU) extrinsic, from the dataset's sensor.yaml T_BS.
_EUROC_T_BODY_CAM = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ]
)


def euroc_calib() -> CameraCalib:
    """EUROC MAV cam0 (MH/V sequences), 752x480 radtan."""
    return CameraCalib(
        fx=458.654, fy=457.296, cx=367.215, cy=248.375,
        dist=(-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05),
        width=752, height=480,
        T_body_cam=_EUROC_T_BODY_CAM,
        rate_cam_hz=20.0, rate_imu_hz=200.0,
    )


def kitti_calib() -> CameraCalib:
    """KITTI odometry gray left, sequences 00-02 (rectified: no distortion)."""
    return CameraCalib(
        fx=718.856, fy=718.856, cx=607.1928, cy=185.2157,
        dist=(0.0, 0.0, 0.0, 0.0),
        width=1241, height=376,
        rate_cam_hz=10.0, rate_imu_hz=100.0,
    )


def tum_calib() -> CameraCalib:
    """TUM RGB-D freiburg1 RGB camera."""
    return CameraCalib(
        fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
        dist=(0.262383, -0.953104, -0.005358, 0.002628),
        width=640, height=480,
        rate_cam_hz=30.0, rate_imu_hz=0.0,
    )


def load_opencv_xml(path: str) -> CameraCalib:
    """Load a reference-style OpenCV-XML calibration file.

    Parses the fields the reference reads (/root/reference/src/CameraModel.cpp:16-52):
    camera matrix, distortion, image size, imu2cam extrinsic, rates. Any field
    absent falls back to defaults.
    """
    import cv2

    fs = cv2.FileStorage(path, cv2.FILE_STORAGE_READ)
    if not fs.isOpened():
        raise FileNotFoundError(path)

    def mat(name):
        node = fs.getNode(name)
        return None if node.empty() else node.mat()

    def real(name, default):
        node = fs.getNode(name)
        return default if node.empty() else node.real()

    K = mat("camera_matrix")
    dist = mat("distortion_coefficients")
    w = int(real("image_width", 752))
    h = int(real("image_height", 480))
    T = mat("imu2cam0")
    if T is None:
        T = np.eye(4)
    d = tuple(np.asarray(dist).flatten()[:4]) if dist is not None else (0.0,) * 4
    fs.release()
    return CameraCalib(
        fx=float(K[0, 0]), fy=float(K[1, 1]), cx=float(K[0, 2]), cy=float(K[1, 2]),
        dist=d, width=w, height=h, T_body_cam=np.asarray(T, np.float64),
        rate_cam_hz=float(real("camera_rate", 20.0)),
        rate_imu_hz=float(real("imu_rate", 200.0)),
    )
