"""IMU bias calibration from static intervals.

Role of the reference's averaging calibrators and static-interval detectors
(/root/reference/src/Imu.cpp:92-274: calibrateAng, detectAngBias, detectAccBias,
calibrateAcc), rebuilt vectorized: variance-windowed static detection and
masked-mean bias estimates with gravity removal.
"""

from __future__ import annotations

import jax.numpy as jnp


def _windowed_std(x, window: int):
    """Per-sample centered-window standard deviation along axis 0, edge-padded."""
    h = window // 2
    xp = jnp.pad(x, ((h, h),) + ((0, 0),) * (x.ndim - 1), mode="edge")
    kernel = jnp.ones((window,), jnp.float32) / window

    def smooth(col):
        return jnp.convolve(col, kernel, mode="same")[h : h + x.shape[0]]

    if x.ndim == 1:
        mean = smooth(xp)
        mean2 = smooth(xp * xp)
    else:
        mean = jnp.stack([smooth(xp[:, i]) for i in range(x.shape[1])], -1)
        mean2 = jnp.stack([smooth(xp[:, i] ** 2) for i in range(x.shape[1])], -1)
    return jnp.sqrt(jnp.maximum(mean2 - mean * mean, 0.0))


def static_mask(gyro, accel, window: int = 20, gyro_std_thresh: float = 0.01,
                accel_std_thresh: float = 0.08, gravity: float = 9.81,
                accel_mag_thresh: float = 1.5, gyro_mag_thresh: float = 0.2):
    """Per-sample boolean mask of quasi-static samples.

    Detection is *variance*-based (windowed std of each axis), which is
    invariant to sensor bias — unlike magnitude thresholds, which reject
    perfectly static data whose bias exceeds the threshold. A loose magnitude
    check on |accel| vs gravity additionally rejects freefall/sustained
    acceleration, and a loose gyro magnitude bound rejects constant-rate
    rotation (zero variance but clearly not static). (Role of the reference's
    detectAngBias/detectAccBias windowed scans,
    /root/reference/src/Imu.cpp:165-274.)
    """
    gyro_std = jnp.max(_windowed_std(gyro, window), axis=-1)
    accel_std = jnp.max(_windowed_std(accel, window), axis=-1)
    accel_dev = jnp.abs(jnp.linalg.norm(accel, axis=-1) - gravity)
    gyro_mag = jnp.linalg.norm(gyro, axis=-1)
    ok = (
        (gyro_std < gyro_std_thresh)
        & (accel_std < accel_std_thresh)
        & (accel_dev < accel_mag_thresh)
        & (gyro_mag < gyro_mag_thresh)
    )
    # Erode by the window so samples adjacent to motion don't count.
    h = window // 2
    okf = jnp.pad(ok.astype(jnp.float32), (h, h), mode="edge")
    kernel = jnp.ones((window,), jnp.float32)
    counts = jnp.convolve(okf, kernel, mode="same")[h : h + ok.shape[0]]
    return counts >= (window - 0.5)


def calibrate_gyro_bias(gyro, mask=None):
    """Mean gyro over static samples (reference calibrateAng, Imu.cpp:92-122)."""
    if mask is None:
        return jnp.mean(gyro, axis=0)
    w = mask.astype(gyro.dtype)[:, None]
    denom = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sum(gyro * w, axis=0) / denom


def calibrate_accel_bias(accel, mask=None, gravity: float = 9.81, R_wb=None):
    """Accel bias from static samples.

    Role of the reference's calibrateAcc (/root/reference/src/Imu.cpp:125-163),
    which subtracts its (nonstandard 9.68) gravity constant using the filter's
    orientation estimate.

    If R_wb (body->world rotation during the static interval) is given, the
    gravity vector is subtracted in the body frame and the bias is fully
    observable: bias = mean(accel) - R_wb^T [0,0,g]. Without an orientation,
    bias is fundamentally entangled with tilt — the best that can be done is
    removing gravity along the measured mean direction, which zeroes the
    recoverable bias almost entirely; callers should pass R_wb.
    """
    if mask is None:
        mean = jnp.mean(accel, axis=0)
    else:
        w = mask.astype(accel.dtype)[:, None]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        mean = jnp.sum(accel * w, axis=0) / denom
    if R_wb is not None:
        g_body = R_wb.T @ jnp.array([0.0, 0.0, gravity], dtype=accel.dtype)
        return mean - g_body
    direction = mean / jnp.maximum(jnp.linalg.norm(mean), 1e-9)
    return mean - gravity * direction
