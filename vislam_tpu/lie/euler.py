"""Euler (roll-pitch-yaw) conversions and angle utilities.

Role of the reference's RPY conversion utilities
(/root/reference/src/Plus.cpp:3-179: toQuaternion/toRPY/rotationMatrix2RPY/
RPY2rotationMatrix/computeDiff/toRPY360), rebuilt batched on jnp arrays.

Convention: intrinsic Z-Y-X (yaw-pitch-roll), i.e. R = Rz(yaw) Ry(pitch) Rx(roll),
matching the aerospace convention the reference uses. RPY vectors are laid out
[roll, pitch, yaw].
"""

from __future__ import annotations

import jax.numpy as jnp

from vislam_tpu.lie.quat import quat_to_mat, mat_to_quat


def rpy_to_quat(rpy):
    """[roll, pitch, yaw] (...,3) -> quaternion [w,x,y,z]."""
    r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def quat_to_rpy(q):
    """Quaternion [w,x,y,z] -> [roll, pitch, yaw], gimbal-safe clamp on pitch."""
    w, x, y, z = (q[..., i] for i in range(4))
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_mat(rpy):
    return quat_to_mat(rpy_to_quat(rpy))


def mat_to_rpy(R):
    return quat_to_rpy(mat_to_quat(R))


def wrap_angle(a):
    """Wrap to (-pi, pi]."""
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def angle_diff(a, b):
    """Shortest signed angular difference a-b, in (-pi, pi].

    Role of the reference's computeDiff (/root/reference/src/Plus.cpp:129-159),
    which special-cases the ±180° seam by hand; arctan2 does it branch-free.
    """
    return wrap_angle(a - b)
