"""Visual-inertial alignment: linear initialization of scale, gravity, and
velocities from up-to-scale vision poses + IMU preintegration.

SURVEY.md §7 flags monocular scale as "the single biggest algorithmic
upgrade risk": the reference cheats with GT scale (src/VISystem.cpp:523-527)
and its plot tool rescales by hand (tools/plot/plot.py:200-202). This module
is the principled replacement (VINS-Mono-style linear alignment): given a
window of keyframes with

  - vision-estimated rotations R_wb_k (body->world; from the filter/vision,
    metrically meaningful) and up-to-scale positions pbar_k,
  - preintegrated IMU factors between consecutive keyframes
    (dv_k, dp_k, dt_k in body-k coordinates),

the kinematic equations

  s (pbar_{k+1} - pbar_k) = v_k dt_k + 1/2 g dt_k^2 + R_wb_k dp_k
  v_{k+1}                 = v_k + g dt_k + R_wb_k dv_k

are LINEAR in the unknowns x = [v_0..v_{K-1}, g, s]. One dense least-squares
solve recovers the monocular scale, the gravity direction (whose norm is a
physics check), and all keyframe velocities. Fully batched; the normal
matrix is (3K+4, 3K+4) — tiny.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class VIAlignment(NamedTuple):
    scale: jnp.ndarray       # ()
    gravity: jnp.ndarray     # (3,) world gravity vector (should be ~[0,0,-9.81])
    velocities: jnp.ndarray  # (K, 3) world-frame velocity at each keyframe
    residual: jnp.ndarray    # () RMS of the stacked equations at the solution


def vi_align(
    R_wb,     # (K, 3, 3) body->world rotations at keyframes
    pbar,     # (K, 3) up-to-scale positions (vision)
    dv,       # (K-1, 3) preintegrated velocity deltas (body-k coords)
    dp,       # (K-1, 3) preintegrated position deltas (body-k coords)
    dt,       # (K-1,) inter-keyframe times
    mask=None,  # (K-1,) valid interval mask
) -> VIAlignment:
    """Solve the linear alignment. K >= 3 intervals recommended."""
    K = R_wb.shape[0]
    n = 3 * K + 4  # velocities + gravity + scale
    m = mask.astype(jnp.float32) if mask is not None else jnp.ones(K - 1)

    eye3 = jnp.eye(3)

    # Build the stacked system A x = b with 6 equations per interval.
    def interval_rows(k):
        dtk = dt[k]
        Rk = R_wb[k]
        # Position equation rows (3): s*dpbar - v_k dt - 1/2 g dt^2 = R dp
        A_pos = jnp.zeros((3, n))
        A_pos = jax.lax.dynamic_update_slice(A_pos, -dtk * eye3, (0, 3 * k))
        A_pos = jax.lax.dynamic_update_slice(
            A_pos, -0.5 * dtk * dtk * eye3, (0, 3 * K)
        )
        A_pos = A_pos.at[:, 3 * K + 3].set(pbar[k + 1] - pbar[k])
        b_pos = Rk @ dp[k]
        # Velocity equation rows (3): v_{k+1} - v_k - g dt = R dv
        A_vel = jnp.zeros((3, n))
        A_vel = jax.lax.dynamic_update_slice(A_vel, -eye3, (0, 3 * k))
        A_vel = jax.lax.dynamic_update_slice(A_vel, eye3, (0, 3 * (k + 1)))
        A_vel = jax.lax.dynamic_update_slice(A_vel, -dtk * eye3, (0, 3 * K))
        b_vel = Rk @ dv[k]
        w = m[k]
        return jnp.concatenate([A_pos, A_vel]) * w, jnp.concatenate([b_pos, b_vel]) * w

    A_all, b_all = jax.vmap(interval_rows)(jnp.arange(K - 1))
    A = A_all.reshape(-1, n)
    b = b_all.reshape(-1)

    AtA = A.T @ A + 1e-8 * jnp.eye(n)
    Atb = A.T @ b
    x = jnp.linalg.solve(AtA, Atb)

    v = x[: 3 * K].reshape(K, 3)
    g = x[3 * K : 3 * K + 3]
    s = x[3 * K + 3]
    r = A @ x - b
    rms = jnp.sqrt(jnp.mean(r * r))
    return VIAlignment(scale=s, gravity=g, velocities=v, residual=rms)


def refine_gravity(align: VIAlignment, g_norm: float = 9.81) -> VIAlignment:
    """Project the recovered gravity onto the known magnitude (physics prior)."""
    g = align.gravity
    g_fixed = g * (g_norm / jnp.maximum(jnp.linalg.norm(g), 1e-9))
    return align._replace(gravity=g_fixed)


def vi_align_fixed_gravity(
    R_wb,     # (K, 3, 3) body->world rotations at keyframes
    pbar,     # (K, 3) up-to-scale positions (vision)
    dv,       # (K-1, 3) preintegrated velocity deltas (body-k coords)
    dp,       # (K-1, 3) preintegrated position deltas (body-k coords)
    dt,       # (K-1,) inter-keyframe times
    g_w,      # (3,) KNOWN world gravity vector
    mask=None,  # (K-1,) valid interval mask
) -> VIAlignment:
    """Alignment with gravity FIXED: unknowns are [v_0..v_{K-1}, s] only.

    The free-gravity solve (vi_align) exists because vision-only SFM yields
    an arbitrary world attitude; when the attitude already comes from a
    gravity-anchored orientation filter (the engine's Madgwick), gravity is
    known in the world frame and estimating it merely adds 3 weakly-observed
    DoF that destabilize short/gentle windows (measured: warm-start scale
    overcorrected 0.78 -> 1.28 with the free solve). This variant is the one
    the engine bootstrap APPLIES; the free solve remains the consistency
    check that validates the window data.
    """
    K = R_wb.shape[0]
    n = 3 * K + 1  # velocities + scale
    m = mask.astype(jnp.float32) if mask is not None else jnp.ones(K - 1)

    eye3 = jnp.eye(3)

    def interval_rows(k):
        dtk = dt[k]
        Rk = R_wb[k]
        # Position rows: s*dpbar - v_k dt = R dp + 1/2 g dt^2
        A_pos = jnp.zeros((3, n))
        A_pos = jax.lax.dynamic_update_slice(A_pos, -dtk * eye3, (0, 3 * k))
        A_pos = A_pos.at[:, 3 * K].set(pbar[k + 1] - pbar[k])
        b_pos = Rk @ dp[k] + 0.5 * dtk * dtk * g_w
        # Velocity rows: v_{k+1} - v_k = R dv + g dt
        A_vel = jnp.zeros((3, n))
        A_vel = jax.lax.dynamic_update_slice(A_vel, -eye3, (0, 3 * k))
        A_vel = jax.lax.dynamic_update_slice(A_vel, eye3, (0, 3 * (k + 1)))
        b_vel = Rk @ dv[k] + dtk * g_w
        w = m[k]
        return (jnp.concatenate([A_pos, A_vel]) * w,
                jnp.concatenate([b_pos, b_vel]) * w)

    A_all, b_all = jax.vmap(interval_rows)(jnp.arange(K - 1))
    A = A_all.reshape(-1, n)
    b = b_all.reshape(-1)

    AtA = A.T @ A + 1e-8 * jnp.eye(n)
    Atb = A.T @ b
    x = jnp.linalg.solve(AtA, Atb)

    v = x[: 3 * K].reshape(K, 3)
    s = x[3 * K]
    r = A @ x - b
    rms = jnp.sqrt(jnp.mean(r * r))
    return VIAlignment(scale=s, gravity=jnp.asarray(g_w), velocities=v,
                       residual=rms)
