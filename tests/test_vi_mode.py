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
