"""Vision-only (KITTI-mode) engine test: no IMU at all; rotation from the
essential matrix; GT scale."""

import dataclasses

import numpy as np
import pytest

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine
from vislam_tpu.eval import ate_rmse
from vislam_tpu.utils.config import SystemConfig


@pytest.fixture(scope="module")
def run():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=30, n_landmarks=300, seed=14))
    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg,
        engine=dataclasses.replace(cfg.engine, vision_rotation=True),
        # Noisy vision-only odometry benefits from anchor-refining BA
        # (measured: rotation drift 9.7 -> 5.7 deg with "oldest2").
        backend=dataclasses.replace(cfg.backend, online_gauge="oldest2"),
        # Vision-only rotation needs fine localization: single-scale (the
        # CLI/KITTI preset do the same; multi-scale measured 0.8 -> 3.6 ATE
        # here on the worst seed).
        frontend=dataclasses.replace(cfg.frontend, levels_used=1),
    )
    eng = VIOEngine(seq["calib"], cfg)
    calib = seq["calib"]
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    from vislam_tpu.engine.refine import refine_window

    imu = np.zeros((16, 6), np.float32)   # NO inertial data at all
    dt = np.zeros(16, np.float32)
    poses, results, last_kf = [], [], 0
    for j in range(1, 30):
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
            # Windowed BA is part of the vision-only configuration: per-pair
            # essential rotations random-walk (~0.6 deg/frame); BA suppresses it.
            state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                  calib.cx, calib.cy)
        poses.append(np.asarray(state.p_wc))
        results.append(res)
    return seq, np.array(poses), results


def test_vision_only_tracks(run):
    seq, poses, results = run
    assert np.isfinite(poses).all()
    ate = ate_rmse(poses, seq["gt_pos"][1:30], align=False)
    # Open-loop monocular VO with per-pair 8-point rotations on a harsh
    # synthetic scene (fx=400, small baselines); BA bounds the random walk.
    # Seed-swept distribution (seeds 10-15): ATE mean ~1.0 m, max 1.6 m.
    assert ate < 2.0, ate


def test_vision_only_rotation_tracks_gt(run):
    seq, poses, results = run
    from scipy.spatial.transform import Rotation as Rsp

    # Body attitude (== camera here) must follow GT despite zero IMU.
    q_est = np.asarray(results[-1].q_wb)
    R_est = Rsp.from_quat(np.roll(q_est, -1)).as_matrix()
    R_gt = Rsp.from_quat(np.roll(seq["gt_quat"][29], -1)).as_matrix()
    err = np.degrees(np.linalg.norm(Rsp.from_matrix(R_est.T @ R_gt).as_rotvec()))
    # Seed-swept: rotation drift mean ~6 deg, max ~8 deg over 29 frames.
    assert err < 10.0, err


def test_vision_only_solves_most_frames(run):
    _, _, results = run
    inl = np.array([int(r.num_inliers) for r in results])
    assert (inl >= 8).mean() > 0.9
