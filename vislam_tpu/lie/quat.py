"""Quaternion math, Hamilton convention, layout [w, x, y, z].

Role of the reference's hand-rolled quaternion utilities
(/root/reference/src/Plus.cpp:3-54) and Sophus' Eigen quaternions, rebuilt as
batched jnp ops. Everything broadcasts over leading dims and is differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q):
    """Normalize to unit quaternion; safe for zero input (returns identity)."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    safe = jnp.where(n > _EPS, n, 1.0)
    out = q / safe
    ident = jnp.broadcast_to(quat_identity(q.dtype), q.shape)
    return jnp.where(n > _EPS, out, ident)


def quat_canonical(q):
    """Flip sign so w >= 0 (q and -q are the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_mul(a, b):
    """Hamilton product a*b: rotation b followed by rotation a (matrix order)."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion q (same as quat_to_mat(q) @ v)."""
    qw = q[..., :1]
    qv = q[..., 1:]
    # v' = v + 2 qv x (qv x v + w v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_mat(q):
    """Unit quaternion -> 3x3 rotation matrix (batched)."""
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m):
    """3x3 rotation matrix -> unit quaternion [w,x,y,z], branch-free.

    Uses the 4-candidate construction (one per largest diagonal combination)
    and selects with where(), so it is jit/vmap safe and stable for all
    rotations (the classic trace-only formula fails near trace -1).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Four squared magnitudes (times 4): qw², qx², qy², qz² candidates.
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(t):
        return jnp.sqrt(jnp.maximum(t, _EPS))

    # Candidate quaternions built around each dominant component.
    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (
        2.0 * safe_sqrt(tw)[..., None]
    )
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1) / (
        2.0 * safe_sqrt(tx)[..., None]
    )
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1) / (
        2.0 * safe_sqrt(ty)[..., None]
    )
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1) / (
        2.0 * safe_sqrt(tz)[..., None]
    )

    t_all = jnp.stack([tw, tx, ty, tz], axis=-1)
    idx = jnp.argmax(t_all, axis=-1)[..., None]
    q = jnp.where(
        idx == 0, qw, jnp.where(idx == 1, qx, jnp.where(idx == 2, qy, qz))
    )
    return quat_canonical(quat_normalize(q))


def quat_from_axis_angle(axis, angle):
    """Unit axis (...,3) + angle (...) -> quaternion."""
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_slerp(q0, q1, t):
    """Spherical linear interpolation, shortest arc, safe for near-equal quats."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    dot = jnp.clip(dot, -1.0, 1.0)
    theta = jnp.arccos(jnp.clip(dot, 0.0, 1.0 - _EPS))
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta))
    return quat_normalize(w0 * q0 + w1 * q1)
