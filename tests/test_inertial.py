"""Tests for filters, bias calibration, and preintegration against the
synthetic generator's analytic ground truth."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu import lie
from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.inertial import (
    calibrate_accel_bias,
    calibrate_gyro_bias,
    complementary_scan,
    dead_reckon,
    madgwick_scan,
    orientation_from_accel,
    preintegrate,
    static_mask,
)
from vislam_tpu.inertial.preintegration import predict_state


def _seq(**kw):
    cfg = SyntheticConfig(n_frames=60, n_landmarks=10, **kw)
    return cfg, make_synthetic_sequence(cfg)


def _gentle_seq(**kw):
    """Low-dynamics trajectory: accel-based attitude correction is only valid
    when specific force ~= gravity, so filter-convergence tests use this."""
    cfg = SyntheticConfig(
        n_frames=60, n_landmarks=10, trans_amp=(0.08, 0.05, 0.03), **kw
    )
    return cfg, make_synthetic_sequence(cfg)


def test_orientation_from_accel_static():
    # Tilted static body: accel measures g rotated into body frame.
    rpy_true = np.array([0.2, -0.3, 0.0])
    R = Rsp.from_euler("ZYX", rpy_true[::-1]).as_matrix()
    accel = R.T @ np.array([0.0, 0.0, 9.81])
    q = orientation_from_accel(jnp.asarray(accel, jnp.float32))
    rpy = np.asarray(lie.quat_to_rpy(q))
    np.testing.assert_allclose(rpy[:2], rpy_true[:2], atol=1e-5)


def test_madgwick_tracks_synthetic_gt():
    cfg, seq = _gentle_seq(seed=5)
    dt = np.full(len(seq["imu_t_ns"]), 1.0 / 200.0, np.float32)
    q0 = jnp.asarray(seq["gt_quat"][0], jnp.float32)
    qf, qs = madgwick_scan(
        q0,
        jnp.asarray(seq["imu_gyro"]),
        jnp.asarray(seq["imu_accel"]),
        jnp.asarray(dt),
        beta=0.05,
    )
    # Compare final orientation to GT (full attitude incl. yaw from gyro).
    q_gt = seq["gt_quat"][-1]
    R_est = np.asarray(lie.quat_to_mat(qf))
    R_gt = np.asarray(lie.quat_to_mat(jnp.asarray(q_gt, jnp.float32)))
    err_deg = np.degrees(
        np.linalg.norm(Rsp.from_matrix(R_est.T @ R_gt).as_rotvec())
    )
    assert err_deg < 2.0, err_deg


def test_madgwick_corrects_bad_init():
    # Start from a wrong tilt; gravity correction must pull roll/pitch back.
    cfg, seq = _gentle_seq(seed=6)
    dt = np.full(len(seq["imu_t_ns"]), 1.0 / 200.0, np.float32)
    q_bad = lie.rpy_to_quat(jnp.asarray([0.3, -0.2, 0.0], jnp.float32))
    q0_true_rpy = np.asarray(lie.quat_to_rpy(jnp.asarray(seq["gt_quat"][0], jnp.float32)))
    qf, _ = madgwick_scan(
        lie.quat_mul(jnp.asarray(seq["gt_quat"][0], jnp.float32), q_bad),
        jnp.asarray(seq["imu_gyro"]),
        jnp.asarray(seq["imu_accel"]),
        jnp.asarray(dt),
        beta=0.2,
    )
    rpy_f = np.asarray(lie.quat_to_rpy(qf))
    rpy_gt = np.asarray(
        lie.quat_to_rpy(jnp.asarray(seq["gt_quat"][-1], jnp.float32))
    )
    # Roll/pitch recovered despite ~20 deg initial error.
    np.testing.assert_allclose(rpy_f[:2], rpy_gt[:2], atol=0.08)


def test_complementary_tracks_roll_pitch():
    cfg, seq = _gentle_seq(seed=7)
    dt = np.full(len(seq["imu_t_ns"]), 1.0 / 200.0, np.float32)
    qf, _ = complementary_scan(
        jnp.asarray(seq["gt_quat"][0], jnp.float32),
        jnp.asarray(seq["imu_gyro"]),
        jnp.asarray(seq["imu_accel"]),
        jnp.asarray(dt),
        alpha=0.01,
    )
    rpy_f = np.asarray(lie.quat_to_rpy(qf))
    rpy_gt = np.asarray(lie.quat_to_rpy(jnp.asarray(seq["gt_quat"][-1], jnp.float32)))
    np.testing.assert_allclose(rpy_f, rpy_gt, atol=0.05)


def test_padding_rows_are_noops():
    cfg, seq = _seq(seed=8)
    g = jnp.asarray(seq["imu_gyro"][:10])
    a = jnp.asarray(seq["imu_accel"][:10])
    dt = jnp.full((10,), 1.0 / 200.0, jnp.float32)
    q0 = jnp.asarray(seq["gt_quat"][0], jnp.float32)
    qf1, _ = madgwick_scan(q0, g, a, dt)
    # Append garbage rows with dt=0: result must be identical.
    g2 = jnp.concatenate([g, jnp.full((6, 3), 99.0)], 0)
    a2 = jnp.concatenate([a, jnp.full((6, 3), -99.0)], 0)
    dt2 = jnp.concatenate([dt, jnp.zeros((6,))], 0)
    qf2, _ = madgwick_scan(q0, g2, a2, dt2)
    np.testing.assert_allclose(np.asarray(qf1), np.asarray(qf2), atol=1e-6)

    p1 = preintegrate(g, a, dt)
    p2 = preintegrate(g2, a2, dt2)
    np.testing.assert_allclose(np.asarray(p1.dR), np.asarray(p2.dR), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p1.dp), np.asarray(p2.dp), atol=1e-6)


def test_bias_calibration_recovers_injected_bias():
    rng = np.random.default_rng(0)
    bg = np.array([0.01, -0.02, 0.005])
    ba = np.array([0.05, 0.03, -0.04])
    n = 400
    gyro = bg + 0.001 * rng.standard_normal((n, 3))
    g_body = np.array([0.0, 0.0, 9.81])
    accel = g_body + ba + 0.005 * rng.standard_normal((n, 3))
    mask = static_mask(jnp.asarray(gyro, jnp.float32), jnp.asarray(accel, jnp.float32))
    assert np.asarray(mask).mean() > 0.9
    bg_est = np.asarray(calibrate_gyro_bias(jnp.asarray(gyro, jnp.float32), mask))
    np.testing.assert_allclose(bg_est, bg, atol=1e-3)
    # With known orientation (level body), the accel bias is fully observable.
    ba_est = np.asarray(
        calibrate_accel_bias(
            jnp.asarray(accel, jnp.float32), mask, R_wb=jnp.eye(3)
        )
    )
    np.testing.assert_allclose(ba_est, ba, atol=2e-3)
    # Without orientation, gravity is removed along the measured direction and
    # the recovered bias collapses toward zero — document that behavior.
    ba_blind = np.asarray(calibrate_accel_bias(jnp.asarray(accel, jnp.float32), mask))
    assert np.linalg.norm(ba_blind) < np.linalg.norm(ba)


def test_static_mask_rejects_motion():
    rng = np.random.default_rng(1)
    n = 300
    gyro = np.zeros((n, 3)); accel = np.tile([0, 0, 9.81], (n, 1)).astype(float)
    gyro[100:150] = 0.5  # a motion burst
    accel[100:150, 0] = 3.0
    m = np.asarray(static_mask(jnp.asarray(gyro, jnp.float32), jnp.asarray(accel, jnp.float32)))
    assert m[:80].all() and m[170:].all()
    assert not m[100:150].any()


def test_preintegration_matches_gt_relative_motion():
    cfg, seq = _seq(seed=9)
    # Window = frames 10 -> 20 (0.5 s, 100 IMU samples).
    i, j = 10, 20
    lo = int(round(i * 10)); hi = int(round(j * 10))
    g = jnp.asarray(seq["imu_gyro"][lo:hi])
    a = jnp.asarray(seq["imu_accel"][lo:hi])
    dt = jnp.full((hi - lo,), 1.0 / 200.0, jnp.float32)
    pre = preintegrate(g, a, dt)

    R_i = Rsp.from_quat(np.roll(seq["gt_quat"][i], -1)).as_matrix()
    R_j = Rsp.from_quat(np.roll(seq["gt_quat"][j], -1)).as_matrix()
    v_i, v_j = seq["gt_vel"][i], seq["gt_vel"][j]
    p_i, p_j = seq["gt_pos"][i], seq["gt_pos"][j]
    T = 0.5
    g_w = np.array([0.0, 0.0, -cfg.gravity])

    dR_gt = R_i.T @ R_j
    dv_gt = R_i.T @ (v_j - v_i - g_w * T)
    dp_gt = R_i.T @ (p_j - p_i - v_i * T - 0.5 * g_w * T * T)

    np.testing.assert_allclose(np.asarray(pre.dR), dR_gt, atol=2e-3)
    np.testing.assert_allclose(np.asarray(pre.dv), dv_gt, atol=0.02)
    np.testing.assert_allclose(np.asarray(pre.dp), dp_gt, atol=0.01)

    # predict_state must reproduce the GT state at j from the GT state at i.
    R_jp, v_jp, p_jp = predict_state(
        pre, jnp.asarray(R_i, jnp.float32), jnp.asarray(v_i, jnp.float32),
        jnp.asarray(p_i, jnp.float32), gravity=cfg.gravity,
    )
    np.testing.assert_allclose(np.asarray(p_jp), p_j, atol=0.01)
    np.testing.assert_allclose(np.asarray(v_jp), v_j, atol=0.02)


def test_preintegration_bias_jacobians():
    cfg, seq = _seq(seed=10)
    g = jnp.asarray(seq["imu_gyro"][:100])
    a = jnp.asarray(seq["imu_accel"][:100])
    dt = jnp.full((100,), 1.0 / 200.0, jnp.float32)
    pre0 = preintegrate(g, a, dt)

    db_g = jnp.asarray([0.004, -0.003, 0.002])
    db_a = jnp.asarray([0.03, -0.02, 0.04])
    pre1 = preintegrate(g, a, dt, bias_gyro=db_g, bias_accel=db_a)

    # First-order corrected predictions from pre0's Jacobians.
    dv_pred = np.asarray(pre0.dv + pre0.J_dv_bg @ db_g + pre0.J_dv_ba @ db_a)
    dp_pred = np.asarray(pre0.dp + pre0.J_dp_bg @ db_g + pre0.J_dp_ba @ db_a)
    dR_pred = np.asarray(pre0.dR) @ Rsp.from_rotvec(
        np.asarray(pre0.J_dR_bg @ db_g)
    ).as_matrix()

    np.testing.assert_allclose(dv_pred, np.asarray(pre1.dv), atol=2e-3)
    np.testing.assert_allclose(dp_pred, np.asarray(pre1.dp), atol=1e-3)
    np.testing.assert_allclose(dR_pred, np.asarray(pre1.dR), atol=1e-4)


def test_dead_reckon_short_window():
    cfg, seq = _seq(seed=11)
    n = 100  # 0.5 s
    q0 = jnp.asarray(seq["gt_quat"][0], jnp.float32)
    v0 = jnp.asarray(seq["gt_vel"][0], jnp.float32)
    p0 = jnp.asarray(seq["gt_pos"][0], jnp.float32)
    dt = jnp.full((n,), 1.0 / 200.0, jnp.float32)
    q, v, p, ps = dead_reckon(
        q0, v0, p0, jnp.asarray(seq["imu_gyro"][:n]), jnp.asarray(seq["imu_accel"][:n]), dt,
        gravity=cfg.gravity,
    )
    np.testing.assert_allclose(np.asarray(p), seq["gt_pos"][10], atol=0.01)
    np.testing.assert_allclose(np.asarray(v), seq["gt_vel"][10], atol=0.02)
    assert ps.shape == (n, 3)
