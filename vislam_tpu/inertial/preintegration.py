"""IMU preintegration (Forster-style) and Euler dead-reckoning as lax.scans.

Upgrades the reference's naive world-frame Euler integration
(/root/reference/src/Imu.cpp:327-372: computeAcceleration/Velocity/Position,
which subtracts gravity 9.68 and accumulates v += a dt, p += v dt) to proper
body-frame preintegrated factors (dR, dv, dp) with first-order bias Jacobians,
the quantities a sliding-window VI backend consumes. dead_reckon() reproduces
the reference's world-frame integration semantics (with correct gravity) for
parity and debugging.

All scans treat dt == 0 rows as padding (exact no-ops), so fixed-size windows
jit cleanly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.so3 import so3_exp, so3_hat, so3_left_jacobian
from vislam_tpu.lie.quat import quat_to_mat, quat_normalize, mat_to_quat


class Preintegrated(NamedTuple):
    """Preintegrated IMU factor between two frames.

    dR: (3,3) rotation from frame i body to frame j body (R_i^T R_j predicted)
    dv: (3,) velocity change in frame-i body coords (gravity-free)
    dp: (3,) position change in frame-i body coords (gravity-free)
    dt: () total integration time
    J_dR_bg, J_dv_bg, J_dv_ba, J_dp_bg, J_dp_ba: (3,3) bias Jacobians
    """

    dR: jnp.ndarray
    dv: jnp.ndarray
    dp: jnp.ndarray
    dt: jnp.ndarray
    J_dR_bg: jnp.ndarray
    J_dv_bg: jnp.ndarray
    J_dv_ba: jnp.ndarray
    J_dp_bg: jnp.ndarray
    J_dp_ba: jnp.ndarray


def preintegrate(gyro, accel, dt, bias_gyro=None, bias_accel=None) -> Preintegrated:
    """Integrate a window of IMU samples into a Preintegrated factor.

    gyro/accel: (S,3) raw measurements; dt: (S,) per-sample intervals
    (0 = padded row). Biases are subtracted if given.
    """
    dtype = gyro.dtype
    if bias_gyro is not None:
        gyro = gyro - bias_gyro
    if bias_accel is not None:
        accel = accel - bias_accel

    eye = jnp.eye(3, dtype=dtype)
    zero = jnp.zeros((3, 3), dtype=dtype)
    init = (
        eye, jnp.zeros(3, dtype), jnp.zeros(3, dtype), jnp.zeros((), dtype),
        zero, zero, zero, zero, zero,
    )

    def step(carry, inp):
        dR, dv, dp, T, J_R_bg, J_v_bg, J_v_ba, J_p_bg, J_p_ba = carry
        w, a, d = inp
        d1 = d[..., None]
        d2 = d1[..., None]

        # Bias Jacobian propagation (first order, Forster et al. eq. 69-71),
        # using the *pre-update* dR.
        a_hat = so3_hat(a)
        dRa = dR @ a_hat
        J_p_bg = J_p_bg + J_v_bg * d1 - 0.5 * dRa @ J_R_bg * (d * d)
        J_p_ba = J_p_ba + J_v_ba * d1 - 0.5 * dR * (d * d)
        J_v_bg = J_v_bg - dRa @ J_R_bg * d1
        J_v_ba = J_v_ba - dR * d1

        # State propagation.
        acc_i = dR @ a  # accel rotated into frame-i body coords
        dp = dp + dv * d + 0.5 * acc_i * d * d
        dv = dv + acc_i * d
        dRk = so3_exp(w * d)
        Jr = so3_left_jacobian(-w * d)  # right Jacobian of exp at (w d)
        J_R_bg = dRk.T @ J_R_bg - Jr * d1
        dR = dR @ dRk
        T = T + d
        return (dR, dv, dp, T, J_R_bg, J_v_bg, J_v_ba, J_p_bg, J_p_ba), None

    # Unrolled: short fixed windows of tiny ops — loop overhead dominates
    # otherwise on TPU.
    (dR, dv, dp, T, J_R_bg, J_v_bg, J_v_ba, J_p_bg, J_p_ba), _ = jax.lax.scan(
        step, init, (gyro, accel, dt), unroll=4
    )
    return Preintegrated(dR, dv, dp, T, J_R_bg, J_v_bg, J_v_ba, J_p_bg, J_p_ba)


def compose(a: Preintegrated, b: Preintegrated, dt_b=None) -> Preintegrated:
    """Chain factor a (i->m) with factor b (m->j) into one factor (i->j).

    Standard preintegration composition with first-order bias-Jacobian
    chaining (both factors must share the same bias linearization point):
        dR = dR_a dR_b,  dv = dv_a + dR_a dv_b,
        dp = dp_a + dv_a T_b + dR_a dp_b.
    dt_b overrides b's integration time (the engine substitutes the frame
    period when the IMU window is empty).
    """
    T_b = b.dt if dt_b is None else dt_b
    dR = a.dR @ b.dR
    dv = a.dv + a.dR @ b.dv
    dp = a.dp + a.dv * T_b + a.dR @ b.dp
    # d/dbias of the composed quantities (Exp(J δ) ≈ I + hat(J δ)):
    J_dR_bg = b.dR.T @ a.J_dR_bg + b.J_dR_bg
    J_dv_bg = a.J_dv_bg + a.dR @ b.J_dv_bg - a.dR @ so3_hat(b.dv) @ a.J_dR_bg
    J_dv_ba = a.J_dv_ba + a.dR @ b.J_dv_ba
    J_dp_bg = (a.J_dp_bg + a.J_dv_bg * T_b + a.dR @ b.J_dp_bg
               - a.dR @ so3_hat(b.dp) @ a.J_dR_bg)
    J_dp_ba = a.J_dp_ba + a.J_dv_ba * T_b + a.dR @ b.J_dp_ba
    return Preintegrated(dR, dv, dp, a.dt + T_b,
                         J_dR_bg, J_dv_bg, J_dv_ba, J_dp_bg, J_dp_ba)


def bias_correct(pre: Preintegrated, dbg, dba) -> Preintegrated:
    """First-order re-linearization of a factor to bias + (dbg, dba).

    Forster et al. eq. 44: dR -> dR Exp(J_dR_bg δbg), dv -> dv + J δb,
    dp -> dp + J δb. The returned factor's Jacobians are unchanged (exact to
    first order); its linearization point is the shifted bias.
    """
    dR = pre.dR @ so3_exp(pre.J_dR_bg @ dbg)
    dv = pre.dv + pre.J_dv_bg @ dbg + pre.J_dv_ba @ dba
    dp = pre.dp + pre.J_dp_bg @ dbg + pre.J_dp_ba @ dba
    return pre._replace(dR=dR, dv=dv, dp=dp)


def predict_state(pre: Preintegrated, R_i, v_i, p_i, gravity=9.81):
    """Propagate world-frame state (R, v, p) through a preintegrated factor."""
    g_w = jnp.array([0.0, 0.0, -gravity], dtype=v_i.dtype)
    T = pre.dt
    R_j = R_i @ pre.dR
    v_j = v_i + g_w * T + R_i @ pre.dv
    p_j = p_i + v_i * T + 0.5 * g_w * T * T + R_i @ pre.dp
    return R_j, v_j, p_j


def dead_reckon(q0, v0, p0, gyro, accel, dt, gravity=9.81):
    """World-frame Euler dead-reckoning over a window (reference parity path).

    Semantics of the reference's computeAcceleration/computeVelocity/
    computePosition chain (/root/reference/src/Imu.cpp:327-372) with correct
    gravity handling: a_world = R a_meas + g_w (g_w = (0,0,-g)).

    Returns (q, v, p) after the window plus the per-sample world positions.
    """
    g_w = jnp.array([0.0, 0.0, -gravity], dtype=v0.dtype)

    def step(carry, inp):
        q, v, p = carry
        w, a, d = inp
        R = quat_to_mat(q)
        a_w = R @ a + g_w
        p = p + v * d + 0.5 * a_w * d * d
        v = v + a_w * d
        # Quaternion update by gyro rotation vector.
        dq = mat_to_quat(so3_exp(w * d))
        from vislam_tpu.lie.quat import quat_mul

        q = quat_normalize(quat_mul(q, dq))
        return (q, v, p), p

    (q, v, p), ps = jax.lax.scan(step, (q0, v0, p0), (gyro, accel, dt))
    return q, v, p, ps
