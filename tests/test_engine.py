"""End-to-end engine tests on synthetic sequences (the ATE acceptance test
the reference never had — SURVEY.md §4)."""

import numpy as np
import pytest

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine
from vislam_tpu.eval import ate_rmse, rpe_rmse


@pytest.fixture(scope="module")
def vio_run():
    cfg = SyntheticConfig(n_frames=40, n_landmarks=300, seed=3)
    seq = make_synthetic_sequence(cfg)
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    poses, results, last_kf = [np.asarray(seq["gt_pos"][0])], [], 0
    for j in range(1, cfg.n_frames):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
        )
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
        poses.append(np.asarray(res.p_wc))
        results.append(res)
    return seq, np.array(poses), results, state


def test_engine_tracks_trajectory(vio_run):
    seq, poses, results, _ = vio_run
    n = len(poses)
    ate = ate_rmse(poses, seq["gt_pos"][:n], align=False)
    assert ate < 0.5, f"ATE {ate:.3f} m"
    # Per-step drift must be small relative to motion.
    rpe = rpe_rmse(poses, seq["gt_pos"][:n])
    assert rpe < 0.05, f"RPE {rpe:.3f} m/frame"


def test_engine_promotes_keyframes(vio_run):
    seq, poses, results, state = vio_run
    n_kf = sum(bool(r.is_keyframe) for r in results)
    assert 5 < n_kf < len(results), n_kf
    assert int(state.kf_count) == n_kf + 1  # +1 for frame 0
    # Window filled up to its capacity.
    assert int(state.window.count) == min(n_kf + 1, state.window.uv.shape[0])


def test_engine_solves_frames(vio_run):
    _, _, results, _ = vio_run
    matches = np.array([int(r.num_matches) for r in results])
    inliers = np.array([int(r.num_inliers) for r in results])
    assert (matches > 50).mean() > 0.9
    assert (inliers >= 8).mean() > 0.9


def test_engine_orientation_tracks_gt(vio_run):
    seq, _, results, state = vio_run
    from scipy.spatial.transform import Rotation as Rsp
    from vislam_tpu import lie
    import jax.numpy as jnp

    R_est = np.asarray(lie.quat_to_mat(jnp.asarray(state.q_wb)))
    n = len(results)
    R_gt = Rsp.from_quat(np.roll(seq["gt_quat"][n], -1)).as_matrix()
    err_deg = np.degrees(np.linalg.norm(Rsp.from_matrix(R_est.T @ R_gt).as_rotvec()))
    assert err_deg < 5.0, err_deg


def test_trajectory_csv_roundtrip(tmp_path, vio_run):
    seq, poses, results, _ = vio_run
    from vislam_tpu.eval import write_trajectory_csv, read_trajectory_csv
    import jax.numpy as jnp
    from vislam_tpu import lie

    rows = []
    for j, r in enumerate(results):
        rows.append(
            dict(
                frame=j + 1,
                t_ns=int(seq["t_cam_ns"][j + 1]),
                is_kf=bool(r.is_keyframe),
                est_p=np.asarray(r.p_wc),
                est_rpy=np.asarray(lie.quat_to_rpy(jnp.asarray(r.q_wb))),
                est_q=np.asarray(r.q_wb),
                est_v=np.asarray(r.v_w),
                gt_p=seq["gt_pos"][j + 1],
                gt_rpy=seq["gt_rpy"][j + 1],
                gt_q=seq["gt_quat"][j + 1],
                gt_v=seq["gt_vel"][j + 1],
            )
        )
    path = str(tmp_path / "traj.csv")
    write_trajectory_csv(path, rows)
    back = read_trajectory_csv(path)
    assert back["frame"].tolist() == [r["frame"] for r in rows]
    np.testing.assert_allclose(back["est_p"], np.stack([r["est_p"] for r in rows]), rtol=1e-6)
    np.testing.assert_allclose(back["gt_q"], np.stack([r["gt_q"] for r in rows]), rtol=1e-6)
    assert back["is_kf"].sum() == sum(bool(r.is_keyframe) for r in results)


def test_engine_multiscale_shapes():
    """levels_used=2 (multi-scale detection) must run the full engine step
    with consistent shapes (K doubles per level budget; opt-in config)."""
    import dataclasses

    import jax.numpy as jnp

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.utils.config import SystemConfig

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=200, seed=0))
    c = SystemConfig()
    cfg = dataclasses.replace(c, frontend=dataclasses.replace(
        c.frontend, levels_used=2, kp_per_cell=4))
    eng = VIOEngine(seq["calib"], cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    assert state.kf_feat.uv.shape[0] == cfg.frontend.max_keypoints == 512
    import numpy as np

    imu = np.zeros((16, 6), np.float32)
    imu[:10] = np.concatenate([seq["imu_gyro"][:10], seq["imu_accel"][:10]], -1)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    state, res = eng.step(state, seq["images"][1], imu, dt, 0.05)
    assert np.isfinite(np.asarray(res.p_wc)).all()
    assert int(res.num_matches) > 30
    # Both levels contributed detections.
    lv = np.asarray(state.kf_feat.level) if hasattr(state.kf_feat, "level") else None
