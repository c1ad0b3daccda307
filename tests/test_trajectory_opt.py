"""Offline loop-closure correction: run VIO over a revisiting trajectory,
archive keyframes, detect+verify the loop, optimize the pose graph, and
check the drift shrinks."""

import numpy as np
import pytest

from vislam_tpu.backend.trajectory_opt import (
    KeyframeRecord, correct_trajectory, record_from_feat,
)
from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine


@pytest.fixture(scope="module")
def loop_run():
    # Position period: x uses 0.25 Hz -> exact revisit at t=4 s = frame 80.
    cfg = SyntheticConfig(n_frames=86, n_landmarks=300, seed=21)
    seq = make_synthetic_sequence(cfg)
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    kfs = [record_from_feat(0, state.kf_R_wc, state.kf_p_wc, state.kf_feat)]
    kf_gt = [seq["gt_pos"][0]]
    last_kf = 0
    for j in range(1, 86):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
            kfs.append(record_from_feat(
                j, state.kf_R_wc, state.kf_p_wc, state.kf_feat))
            kf_gt.append(seq["gt_pos"][j])
    return seq, kfs, np.array(kf_gt)


def test_loop_correction_reduces_drift(loop_run):
    seq, kfs, kf_gt = loop_run
    calib = seq["calib"]
    assert len(kfs) > 15

    p0 = np.stack([k.p_wc for k in kfs])
    err_before = np.linalg.norm(p0 - kf_gt, axis=-1)

    p_corr, R_corr, info = correct_trajectory(
        kfs, calib.fx, calib.fy, calib.cx, calib.cy,
        min_separation=10, sim_thresh=0.80, min_inliers=25,
    )
    assert info["loops"], "no loop closures found on a revisiting trajectory"
    # Verified loops must connect a late keyframe to an early one.
    assert any(b - a >= 10 for a, b, _ in info["loops"])

    err_after = np.linalg.norm(p_corr - kf_gt, axis=-1)
    # Loop correction should substantially reduce the worst drift.
    assert err_after.max() < 0.75 * err_before.max(), (
        err_before.max(), err_after.max(), info,
    )
    assert np.isfinite(p_corr).all()
