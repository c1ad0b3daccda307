"""IMU orientation filters as in-process lax.scan ops.

Role of the reference's biggest architectural wart: its orientation filter is
an *external ROS node* (imu_filter_madgwick / imu_complementary_filter) that
every IMU sample round-trips through pub/sub inside the hot loop
(/root/reference/src/Imu.cpp:279-317,464-546; launch/vi_slam.launch:19-24).
Here both filters are pure jnp scans that fuse into the jitted frame step.

Conventions: quaternions [w,x,y,z] rotate body->world; accelerometer measures
specific force (gravity reads +g on the body z axis when level and static).
Padded samples are encoded with dt = 0, which makes the update a no-op.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vislam_tpu.lie.quat import quat_mul, quat_normalize


def orientation_from_accel(accel):
    """Tilt-only quaternion from a (quasi-)static accelerometer sample.

    Yaw is unobservable from accel; this returns the roll/pitch-aligned
    quaternion with zero yaw (used for filter init, same role as the
    reference's GT-yaw-aligned init, /root/reference/src/Imu.cpp:41-90).
    """
    a = accel / jnp.maximum(jnp.linalg.norm(accel, axis=-1, keepdims=True), 1e-9)
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]
    roll = jnp.arctan2(ay, az)
    pitch = jnp.arctan2(-ax, jnp.sqrt(ay * ay + az * az))
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    return jnp.stack([cr * cp, sr * cp, cr * sp, -sr * sp], axis=-1)


def madgwick_step(q, gyro, accel, dt, beta=0.1, gravity=9.81):
    """One Madgwick IMU update (gyro + accel gravity correction).

    Standard formulation: objective f(q) = R(q)^T g_hat - a_hat; the gradient
    descent step is folded into the quaternion rate before integration.

    Improvement over the stock filter the reference shells out to: the accel
    correction is gated by how close |accel| is to gravity, so dynamic
    acceleration (specific force far from g) doesn't drag the attitude.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    a = accel / jnp.maximum(jnp.linalg.norm(accel, axis=-1, keepdims=True), 1e-9)
    ax, ay, az = a[..., 0], a[..., 1], a[..., 2]

    # Objective: predicted gravity direction in body frame minus measured.
    f1 = 2.0 * (x * z - w * y) - ax
    f2 = 2.0 * (w * x + y * z) - ay
    f3 = 2.0 * (0.5 - x * x - y * y) - az
    # J^T f (Jacobian of f wrt q), the Madgwick gradient.
    g1 = -2.0 * y * f1 + 2.0 * x * f2
    g2 = 2.0 * z * f1 + 2.0 * w * f2 - 4.0 * x * f3
    g3 = -2.0 * w * f1 + 2.0 * z * f2 - 4.0 * y * f3
    g4 = 2.0 * x * f1 + 2.0 * y * f2
    grad = jnp.stack([g1, g2, g3, g4], axis=-1)
    gn = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    grad = grad / jnp.maximum(gn, 1e-12)
    # Gate the correction: full weight when |accel| ~= g (pure gravity),
    # decaying to 0 as dynamic acceleration dominates; 0 in freefall.
    a_mag = jnp.linalg.norm(accel, axis=-1, keepdims=True)
    rel_dev = jnp.abs(a_mag - gravity) / gravity
    acc_w = jnp.exp(-(rel_dev / 0.1) ** 2) * (a_mag > 1e-6).astype(q.dtype)

    omega = jnp.concatenate([jnp.zeros_like(gyro[..., :1]), gyro], axis=-1)
    q_dot = 0.5 * quat_mul(q, omega) - beta * acc_w * grad
    q_new = q + q_dot * dt[..., None]
    return quat_normalize(q_new)


def madgwick_scan(q0, gyro, accel, dt, beta=0.1, gravity=9.81):
    """Scan the Madgwick filter over a window.

    gyro/accel: (S,3), dt: (S,) with 0 for padded rows. Returns (q_final,
    q_all (S,4)). Fully unrolled: windows are short (10-16 samples) and each
    step is tiny VPU work, so unrolling removes the per-iteration loop
    overhead that otherwise dominates on TPU.
    """

    def step(q, inp):
        g, a, d = inp
        q_new = madgwick_step(q, g, a, d, beta, gravity)
        return q_new, q_new

    return jax.lax.scan(step, q0, (gyro, accel, dt), unroll=4)


def complementary_step(q, gyro, accel, dt, alpha=0.02, gravity=9.81):
    """One complementary-filter update: gyro integration + slerp-like tilt blend.

    Role of the reference's alternative external filter
    (launch/vi_slamComp.launch; imu_complementary_filter node).
    """
    omega = jnp.concatenate([jnp.zeros_like(gyro[..., :1]), gyro], axis=-1)
    q_gyro = quat_normalize(q + 0.5 * quat_mul(q, omega) * dt[..., None])

    # Tilt correction: rotate measured accel to world; the deviation of the
    # result from +z gives a small corrective rotation, blended by alpha.
    from vislam_tpu.lie.quat import quat_rotate

    a = accel / jnp.maximum(jnp.linalg.norm(accel, axis=-1, keepdims=True), 1e-9)
    g_world = quat_rotate(q_gyro, a)  # should be ~[0,0,1]
    gx, gy, gz = g_world[..., 0], g_world[..., 1], g_world[..., 2]
    # Axis = g_world x z_hat, angle = arccos(gz); small-angle corrective quat.
    axis = jnp.stack([gy, -gx, jnp.zeros_like(gx)], axis=-1)
    axis_n = jnp.maximum(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-9)
    angle = jnp.arccos(jnp.clip(gz, -1.0 + 1e-7, 1.0 - 1e-7))
    # Same dynamic-acceleration gating as the Madgwick path.
    a_mag = jnp.linalg.norm(accel, axis=-1, keepdims=True)
    acc_w = jnp.exp(-(jnp.abs(a_mag - gravity) / (0.1 * gravity)) ** 2)
    half = 0.5 * alpha * acc_w * angle[..., None]
    dq = jnp.concatenate([jnp.cos(half), axis / axis_n * jnp.sin(half)], axis=-1)
    # Skip correction on padded rows (dt == 0).
    active = (dt > 0).astype(q.dtype)[..., None]
    ident = jnp.zeros_like(dq).at[..., 0].set(1.0)
    dq = active * dq + (1.0 - active) * ident
    return quat_normalize(quat_mul(dq, q_gyro))


def complementary_scan(q0, gyro, accel, dt, alpha=0.02, gravity=9.81):
    def step(q, inp):
        g, a, d = inp
        q_new = complementary_step(q, g, a, d, alpha, gravity)
        return q_new, q_new

    return jax.lax.scan(step, q0, (gyro, accel, dt), unroll=4)
