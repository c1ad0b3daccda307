"""Visual-inertial sliding-window bundle adjustment.

Extends the vision-only windowed BA (backend/ba.py) with preintegrated-IMU
factors between consecutive keyframes — the capability the reference
approximates by injecting ground-truth scale (setGtRes,
/root/reference/src/VISystem.cpp:415-419) and the north star requires
GT-free: with accelerometer factors in the window, monocular scale,
gravity-aligned roll/pitch, and per-keyframe velocities all become
observable, so only ONE pose needs gauge-fixing (vs two for vision-only
monocular BA).

Structure (TPU-first):
  - State per keyframe: world->camera pose (R, t) + world velocity v.
    Parameter layout per keyframe: [6 se3 twist | 3 dv] = 9.
  - Vision factors: the existing batched-einsum normal equations; landmarks
    eliminated per keyframe-pose block with the same Schur reduction
    (ba.reduce_landmarks) — unchanged math, unchanged sharding story.
  - IMU factors (Forster-style residuals on (dR, dv, dp)):
        r_R = log( dR_meas^T R_wb_i^T R_wb_j )
        r_v = R_wb_i^T (v_j - v_i - g dt)            - dv_meas
        r_p = R_wb_i^T (p_j - p_i - v_i dt - g dt^2/2) - dp_meas
    Jacobians by forward-mode autodiff of the 9W-dim perturbation — the
    whole IMU block is ~(9W x 9W) with W<=10: negligible FLOPs, and autodiff
    keeps the left-multiplicative se3 convention exactly consistent with the
    vision update (ba._apply_update).
  - The reduced camera system is extended from (6W) to (9W) and solved with
    one Cholesky; landmarks back-substitute from the pose part.

Body frame: R_wb = R_wc @ R_bc^T with R_bc the camera->body extrinsic
rotation; the lever arm p_bc is neglected, matching the engine's convention
(engine/engine.py treats IMU displacement as camera displacement).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.backend.ba import (
    BAProblem,
    BAState,
    _apply_update,
    back_substitute_landmarks,
    build_normal_equations,
    reduce_landmarks,
    robust_cost,
)
from vislam_tpu.lie.se3 import se3_exp
from vislam_tpu.lie.so3 import so3_log


class ImuFactors(NamedTuple):
    """Preintegrated factors between consecutive window keyframes.

    Slot w holds the factor (w-1) -> w; slot 0 must carry valid=False.
    """

    dR: jnp.ndarray      # (W, 3, 3) body rotation i->j
    dv: jnp.ndarray      # (W, 3) velocity delta, frame-i body coords
    dp: jnp.ndarray      # (W, 3) position delta, frame-i body coords
    dt: jnp.ndarray      # (W,)
    valid: jnp.ndarray   # (W,) bool


def imu_residuals(R_cw, t_cw, v, fac: ImuFactors, g_w, R_bc):
    """(W, 9) stacked [r_R, r_v, r_p] per factor (row w: keyframes w-1 -> w).

    Invalid rows are NOT masked here — the caller weights them to zero.
    """
    R_wb = jnp.einsum("wji,kj->wik", R_cw, R_bc)  # R_cw^T @ R_bc^T (W,3,3)
    p = -jnp.einsum("wji,wj->wi", R_cw, t_cw)     # camera/body position
    Ri = R_wb[:-1]
    Rj = R_wb[1:]
    dt = fac.dt[1:, None]
    dv_w = v[1:] - v[:-1] - g_w[None] * dt
    dp_w = p[1:] - p[:-1] - v[:-1] * dt - 0.5 * g_w[None] * dt * dt

    E = jnp.einsum("wji,wjk->wik", fac.dR[1:], jnp.einsum(
        "wji,wjk->wik", Ri, Rj))                  # dR^T Ri^T Rj
    r_R = jax.vmap(so3_log)(E)
    r_v = jnp.einsum("wji,wj->wi", Ri, dv_w) - fac.dv[1:]
    r_p = jnp.einsum("wji,wj->wi", Ri, dp_w) - fac.dp[1:]
    r = jnp.concatenate([r_R, r_v, r_p], axis=-1)  # (W-1, 9)
    return jnp.concatenate([jnp.zeros((1, 9), r.dtype), r], axis=0)


def _imu_weights(fac: ImuFactors, w_rot, w_vel, w_pos):
    """(W, 9) per-residual precisions: 1/dt-scaled, zeroed when invalid.

    Continuous-time noise: residual covariance grows ~ dt, so the
    information weight is w/dt (per-component diagonal approximation of
    the preintegration covariance — cheap, fixed-shape, and adequate for
    windowed refinement).
    """
    dt = jnp.maximum(fac.dt, 1e-3)
    m = fac.valid.astype(jnp.float32)
    ones = jnp.ones_like(dt)
    w = jnp.concatenate([
        (w_rot / dt * m)[:, None] * ones[:, None].repeat(3, 1),
        (w_vel / dt * m)[:, None] * ones[:, None].repeat(3, 1),
        (w_pos / dt * m)[:, None] * ones[:, None].repeat(3, 1),
    ], axis=-1)
    return w


def imu_cost(R_cw, t_cw, v, fac, g_w, R_bc, w_rot, w_vel, w_pos):
    r = imu_residuals(R_cw, t_cw, v, fac, g_w, R_bc)
    w = _imu_weights(fac, w_rot, w_vel, w_pos)
    return 0.5 * jnp.sum(w * r * r)


def _imu_normal_equations(R_cw, t_cw, v, fac, g_w, R_bc,
                          w_rot, w_vel, w_pos):
    """Gauss-Newton blocks of the IMU factors over the (W, 9) perturbation.

    Perturbation convention matches ba._apply_update exactly:
    (R, t) <- se3_exp(dxi) * (R, t) (left-multiplicative), v <- v + dv.
    Returns (H (W,9,W,9), b (W,9)).
    """
    W = R_cw.shape[0]
    w = _imu_weights(fac, w_rot, w_vel, w_pos)  # (W, 9)

    def r_of(delta):
        dR, dt_ = se3_exp(delta[:, :6])
        R_new = jnp.einsum("wij,wjk->wik", dR, R_cw,
                           preferred_element_type=jnp.float32)
        t_new = jnp.einsum("wij,wj->wi", dR, t_cw,
                           preferred_element_type=jnp.float32) + dt_
        return imu_residuals(R_new, t_new, v + delta[:, 6:], fac, g_w, R_bc)

    zero = jnp.zeros((W, 9), jnp.float32)
    r0 = r_of(zero)                         # (W, 9)
    J = jax.jacfwd(r_of)(zero)              # (W, 9, W, 9)
    Jf = J.reshape(W * 9, W * 9)            # residual-major x param-major
    wf = w.reshape(W * 9)
    Hf = (Jf * wf[:, None]).T @ Jf          # (9W, 9W)
    bf = -(Jf * wf[:, None]).T @ r0.reshape(W * 9)
    return Hf.reshape(W, 9, W, 9), bf.reshape(W, 9)


def solve_vi_system(S, rhs, H_imu, b_imu, lam, fixed_mask):
    """Solve the extended (9W) camera+velocity system.

    S (W,W,6,6)/rhs (W,6): vision reduced system (damped, from
    ba.reduce_landmarks). H_imu (W,9,W,9)/b_imu (W,9): IMU GN blocks.
    fixed_mask (W,) gauge-fixes whole poses (their velocity stays free).
    Returns (dxi (W,6), dv (W,3)).
    """
    W = S.shape[0]
    A = H_imu.reshape(W, 9, W, 9)
    A = A.at[:, :6, :, :6].add(S.transpose(0, 2, 1, 3))
    b = b_imu.at[:, :6].add(rhs)

    Am = A.reshape(W * 9, W * 9)
    bm = b.reshape(W * 9)
    # Velocity damping floor: velocities of keyframes with no valid IMU
    # factor are unobservable — the floor keeps the system SPD (their
    # update is then ~0).
    didx = jnp.arange(W * 9)
    is_vel = (didx % 9) >= 6
    Am = Am.at[didx, didx].add(jnp.where(is_vel, lam + 1e-4, 0.0))

    free = jnp.repeat(~fixed_mask, 9)
    # Velocities always refine, even at gauge-fixed poses.
    free = free | is_vel
    Am = jnp.where(free[:, None] & free[None, :], Am, 0.0)
    Am = Am.at[didx, didx].add(jnp.where(free, 0.0, 1.0))
    bm = jnp.where(free, bm, 0.0)

    L = jnp.linalg.cholesky(Am + 1e-8 * jnp.eye(W * 9, dtype=Am.dtype))
    d = jax.scipy.linalg.cho_solve((L, True), bm).reshape(W, 9)
    return d[:, :6], d[:, 6:]


@partial(jax.jit, static_argnames=("iters",))
def vi_bundle_adjust(
    state: BAState,
    prob: BAProblem,
    v,
    fac: ImuFactors,
    g_w,
    R_bc,
    iters: int = 10,
    lam0: float = 1e-3,
    huber_delta: float = 2.0,
    w_rot: float = 1e4,
    w_vel: float = 1e2,
    w_pos: float = 1e2,
    fixed_mask=None,
):
    """LM loop over poses, velocities, and landmarks with IMU factors.

    fixed_mask (W,) bool: gauge-fixed poses (default: pose 0 only — with
    IMU factors the scale and gravity direction are observable, so the
    monocular second-pose fix of the vision-only BA is unnecessary).
    Returns ((BAState, v), info).
    """
    W = state.R.shape[0]
    if fixed_mask is None:
        fixed_mask = jnp.arange(W) == 0

    def total_cost(st, vv):
        return robust_cost(st, prob, huber_delta) + imu_cost(
            st.R, st.t, vv, fac, g_w, R_bc, w_rot, w_vel, w_pos
        )

    def step(carry, _):
        st, vv, lam, cost = carry
        Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(st, prob, huber_delta)
        S, rhs, Hll_inv = reduce_landmarks(Hpp, Hpl, Hll, bp, bl, lam)
        H_imu, b_imu = _imu_normal_equations(
            st.R, st.t, vv, fac, g_w, R_bc, w_rot, w_vel, w_pos
        )
        dxi, dv = solve_vi_system(S, rhs, H_imu, b_imu, lam, fixed_mask)
        dX = back_substitute_landmarks(Hpl, Hll_inv, bl, dxi)
        cand = _apply_update(st, dxi, dX)
        cand_v = vv + dv
        cand_cost = total_cost(cand, cand_v)
        finite = (
            jnp.isfinite(cand_cost)
            & jnp.all(jnp.isfinite(dxi))
            & jnp.all(jnp.isfinite(dv))
            & jnp.all(jnp.isfinite(dX))
        )
        accept = finite & (cand_cost < cost)
        new_st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, st)
        new_v = jnp.where(accept, cand_v, vv)
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), lam * 4.0)
        new_cost = jnp.where(accept, cand_cost, cost)
        return (new_st, new_v, new_lam, new_cost), new_cost

    cost0 = total_cost(state, v)
    (state, v, lam, cost), costs = jax.lax.scan(
        step, (state, v, jnp.asarray(lam0, jnp.float32), cost0), None,
        length=iters,
    )
    info = {"costs": costs, "final_cost": cost, "initial_cost": cost0,
            "lam": lam}
    return (state, v), info
