"""Pinhole + radial-tangential camera model as vectorized JAX ops.

Role of the reference's CameraModel (/root/reference/src/CameraModel.cpp:16-141):
XML intrinsics parse, getOptimalNewCameraMatrix + initUndistortRectifyMap
precompute, and remap-based Undistort — rebuilt as pure functions on jnp
arrays. The undistortion map is precomputed once on host (numpy) and the
per-frame remap is a batched bilinear gather that XLA fuses into the
preprocessing graph (Pallas variant lives in vislam_tpu/ops).

Conventions: pixel coords are (u, v) = (col, row), origin at the top-left
pixel center. Normalized coords x = (u - cx)/fx, y = (v - cy)/fy.
Distortion params [k1, k2, p1, p2] (radtan, OpenCV order).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraCalib:
    """Static calibration record (host-side; arrays are plain numpy)."""

    fx: float
    fy: float
    cx: float
    cy: float
    dist: tuple  # (k1, k2, p1, p2)
    width: int
    height: int
    # Rigid transform taking points in the camera frame to the IMU/body frame
    # (EUROC sensor.yaml T_BS for cam0; reference calibrationEUROC.xml imu2cam0).
    T_body_cam: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float64)
    )
    rate_cam_hz: float = 20.0
    rate_imu_hz: float = 200.0

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float64,
        )

    @property
    def has_distortion(self) -> bool:
        return any(abs(d) > 1e-12 for d in self.dist)


def scale_calib(calib: CameraCalib, sx: float, sy: float) -> CameraCalib:
    """Rescale intrinsics for a resized image (reference CameraModel.cpp:61-68)."""
    return dataclasses.replace(
        calib,
        fx=calib.fx * sx,
        fy=calib.fy * sy,
        cx=calib.cx * sx,
        cy=calib.cy * sy,
        width=int(round(calib.width * sx)),
        height=int(round(calib.height * sy)),
    )


def distort_normalized(xn, dist):
    """Apply radtan distortion to normalized coords xn (...,2) -> (...,2)."""
    k1, k2, p1, p2 = dist
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xd, dist, iters: int = 8):
    """Invert radtan distortion by fixed-point iteration (jit-friendly, fixed count)."""
    k1, k2, p1, p2 = dist
    x = xd[..., 0]
    y = xd[..., 1]
    x0, y0 = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + k1 * r2 + k2 * r2 * r2
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (x0 - dx) / radial
        y = (y0 - dy) / radial
    return jnp.stack([x, y], axis=-1)


def project_points(X_cam, fx, fy, cx, cy, dist=None):
    """Camera-frame 3D points (...,3) -> pixel coords (...,2).

    Points behind the camera project to garbage; callers mask on X_cam[...,2]>0.
    """
    z = X_cam[..., 2:3]
    safe_z = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    xn = X_cam[..., :2] / safe_z
    if dist is not None:
        xn = distort_normalized(xn, dist)
    u = xn[..., 0] * fx + cx
    v = xn[..., 1] * fy + cy
    return jnp.stack([u, v], axis=-1)


def unproject_pixels(uv, fx, fy, cx, cy, dist=None):
    """Pixels (...,2) -> unit-depth normalized rays (...,3) (z=1)."""
    x = (uv[..., 0] - cx) / fx
    y = (uv[..., 1] - cy) / fy
    xn = jnp.stack([x, y], axis=-1)
    if dist is not None:
        xn = undistort_normalized(xn, dist)
    return jnp.concatenate([xn, jnp.ones_like(xn[..., :1])], axis=-1)


def compute_undistort_maps(calib: CameraCalib, new_size=None, alpha: float = 0.0):
    """Precompute the (map_u, map_v) sampling grid and the rectified intrinsics.

    Role of getOptimalNewCameraMatrix + initUndistortRectifyMap
    (/root/reference/src/CameraModel.cpp:84-100). alpha=0 crops to valid pixels
    (the reference then further crops a ROI); alpha=1 keeps all source pixels.

    Returns (maps, new_calib) where maps is float32 (H_out, W_out, 2) giving,
    for each output pixel, the source pixel to sample.
    """
    H_out, W_out = new_size if new_size is not None else (calib.height, calib.width)

    # Undistort a border ring of source pixels to find the valid output extent.
    n = 64
    us = np.linspace(0, calib.width - 1, n)
    vs = np.linspace(0, calib.height - 1, n)
    border = np.concatenate(
        [
            np.stack([us, np.zeros(n)], -1),
            np.stack([us, np.full(n, calib.height - 1)], -1),
            np.stack([np.zeros(n), vs], -1),
            np.stack([np.full(n, calib.width - 1), vs], -1),
        ]
    )
    rays = np.asarray(
        unproject_pixels(
            jnp.asarray(border, jnp.float32),
            calib.fx, calib.fy, calib.cx, calib.cy, calib.dist,
        )
    )
    xn = rays[:, :2]
    # Outer (all) and inner (inscribed) extents of the undistorted border.
    outer = (xn[:, 0].min(), xn[:, 0].max(), xn[:, 1].min(), xn[:, 1].max())
    top = xn[:n]; bottom = xn[n:2*n]; left = xn[2*n:3*n]; right = xn[3*n:]
    inner = (left[:, 0].max(), right[:, 0].min(), top[:, 1].max(), bottom[:, 1].min())
    x0o, x1o, y0o, y1o = outer
    x0i, x1i, y0i, y1i = inner
    x0 = alpha * x0o + (1 - alpha) * x0i
    x1 = alpha * x1o + (1 - alpha) * x1i
    y0 = alpha * y0o + (1 - alpha) * y0i
    y1 = alpha * y1o + (1 - alpha) * y1i

    fx_new = (W_out - 1) / (x1 - x0)
    fy_new = (H_out - 1) / (y1 - y0)
    cx_new = -x0 * fx_new
    cy_new = -y0 * fy_new

    # For each output pixel: normalized coords under new K -> distort -> source px.
    vv, uu = np.meshgrid(np.arange(H_out), np.arange(W_out), indexing="ij")
    xn_out = np.stack(
        [(uu - cx_new) / fx_new, (vv - cy_new) / fy_new], axis=-1
    )
    xd = np.asarray(distort_normalized(jnp.asarray(xn_out), calib.dist))
    map_u = xd[..., 0] * calib.fx + calib.cx
    map_v = xd[..., 1] * calib.fy + calib.cy
    maps = np.stack([map_u, map_v], axis=-1).astype(np.float32)

    new_calib = CameraCalib(
        fx=float(fx_new), fy=float(fy_new), cx=float(cx_new), cy=float(cy_new),
        dist=(0.0, 0.0, 0.0, 0.0), width=W_out, height=H_out,
        T_body_cam=calib.T_body_cam,
        rate_cam_hz=calib.rate_cam_hz, rate_imu_hz=calib.rate_imu_hz,
    )
    return maps, new_calib


def remap_bilinear(image, maps):
    """Bilinear remap: sample `image` (H,W) or (H,W,C) at `maps` (Ho,Wo,2) (u,v).

    Out-of-bounds samples return 0 (reference remap uses BORDER_CONSTANT).
    Pure gather + lerp; XLA fuses this with downstream preprocessing.
    """
    H, W = image.shape[0], image.shape[1]
    u = maps[..., 0]
    v = maps[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    def sample(vi, ui):
        valid = (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        ui_c = jnp.clip(ui, 0, W - 1)
        vi_c = jnp.clip(vi, 0, H - 1)
        vals = image[vi_c, ui_c]
        if image.ndim == 3:
            valid = valid[..., None]
        return jnp.where(valid, vals, 0)

    img_f = image.astype(jnp.float32)
    p00 = sample(v0i, u0i).astype(jnp.float32)
    p01 = sample(v0i, u0i + 1).astype(jnp.float32)
    p10 = sample(v0i + 1, u0i).astype(jnp.float32)
    p11 = sample(v0i + 1, u0i + 1).astype(jnp.float32)
    if image.ndim == 3:
        du = du[..., None]
        dv = dv[..., None]
    out = (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )
    del img_f
    return out


def undistort_image(image, maps):
    """Convenience wrapper matching the reference's Undistort (CameraModel.cpp:103-105)."""
    return remap_bilinear(image, jnp.asarray(maps))
