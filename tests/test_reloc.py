"""Relocalization (backend/reloc.py) + scan-mode keyframe archiving
(trajectory_opt.keyframes_from_scan): VERDICT round-1 weak #7 — after a
visual outage the system must snap back onto the map instead of
dead-reckoning forever, and --scan --loop-correct must work."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from vislam_tpu.backend.reloc import attempt_relocalization
from vislam_tpu.backend.trajectory_opt import (
    KeyframeRecord,
    keyframes_from_scan,
)
from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine
from vislam_tpu.frontend.features import extract_features
from vislam_tpu.utils.config import FrontendConfig


def _gt_record(seq, j, fcfg=FrontendConfig()):
    from scipy.spatial.transform import Rotation as Rsp

    f = extract_features(jnp.asarray(seq["images"][j], jnp.float32), fcfg)
    R_wc = Rsp.from_quat(np.roll(seq["gt_quat"][j], -1)).as_matrix()
    return KeyframeRecord(
        frame_index=j, R_wc=R_wc.astype(np.float32),
        p_wc=seq["gt_pos"][j].astype(np.float32),
        uv=np.asarray(f.uv), desc=np.asarray(f.desc),
        kp_mask=np.asarray(f.mask),
    )


def test_relocalization_recovers_gt_pose():
    """Archive built at GT poses; a held-out frame must relocalize to within
    centimeters of its GT pose from an identity PnP init."""
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=40, n_landmarks=300, seed=0))
    calib = seq["calib"]
    archive = [_gt_record(seq, j) for j in range(0, 30, 3)]

    j_live = 20  # held out (archive has 18 and 21, not 20)
    f = extract_features(jnp.asarray(seq["images"][j_live], jnp.float32),
                         FrontendConfig())
    r = attempt_relocalization(
        np.asarray(f.uv), np.asarray(f.desc), np.asarray(f.mask),
        archive, calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert r.success, (r.n_inliers, r.rmse)
    err = np.linalg.norm(r.p_wc - seq["gt_pos"][j_live])
    assert err < 0.05, err
    from scipy.spatial.transform import Rotation as Rsp

    R_gt = Rsp.from_quat(np.roll(seq["gt_quat"][j_live], -1)).as_matrix()
    rot_err = np.degrees(np.arccos(np.clip(
        (np.trace(r.R_wc @ R_gt.T) - 1) / 2, -1, 1)))
    assert rot_err < 1.0, rot_err


def test_relocalization_rejects_unseen_place():
    """A frame of pure noise must NOT relocalize (no false positives)."""
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=40, n_landmarks=300, seed=0))
    calib = seq["calib"]
    archive = [_gt_record(seq, j) for j in range(0, 30, 3)]
    rng = np.random.default_rng(7)
    noise = (rng.uniform(0, 255, seq["images"][0].shape)).astype(np.uint8)
    f = extract_features(jnp.asarray(noise, jnp.float32), FrontendConfig())
    r = attempt_relocalization(
        np.asarray(f.uv), np.asarray(f.desc), np.asarray(f.mask),
        archive, calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert not r.success


def test_engine_relocalize_reanchors_state():
    """VIOEngine.relocalize must re-anchor pose/keyframe, keep biases, and
    leave the engine steppable (tracking resumes from the corrected pose)."""
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=12, n_landmarks=300, seed=0))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    state = state._replace(bias_g=jnp.asarray([0.01, -0.02, 0.03]))
    # Pretend the pose drifted; relocalize to the GT pose of frame 5.
    from scipy.spatial.transform import Rotation as Rsp

    R_wc = Rsp.from_quat(np.roll(seq["gt_quat"][5], -1)).as_matrix()
    p_wc = seq["gt_pos"][5]
    state2 = eng.relocalize(state, seq["images"][5], R_wc, p_wc)
    np.testing.assert_allclose(np.asarray(state2.p_wc), p_wc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state2.kf_p_wc), p_wc, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state2.bias_g),
                               np.asarray(state.bias_g))
    assert int(state2.window.count) == 1  # window restarted
    # Must still step.
    imu = np.zeros((16, 6), np.float32)
    imu[:10] = np.concatenate([seq["imu_gyro"][50:60], seq["imu_accel"][50:60]], -1)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    state3, res = eng.step(state2, seq["images"][6], imu, dt, 0.05)
    assert np.isfinite(np.asarray(state3.p_wc)).all()
    assert int(res.num_matches) > 30  # tracking resumed against frame 5


def test_outage_then_relocalization_end_to_end():
    """Run VIO, blank out vision mid-run while injecting pose drift, then
    verify relocalization snaps the error back down on map re-entry."""
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=44, n_landmarks=300, seed=0))
    calib = seq["calib"]
    eng = VIOEngine(calib)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    archive = []
    drift = np.array([0.5, -0.3, 0.2], np.float32)
    last_kf = 0
    for j in range(1, 40):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        img = seq["images"][j]
        if 28 <= j < 36:
            img = np.zeros_like(img)  # outage
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        state, res = eng.step(state, img, imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
        if bool(res.is_keyframe) and j < 28:
            archive.append(KeyframeRecord(
                frame_index=j,
                R_wc=np.asarray(state.kf_R_wc), p_wc=np.asarray(state.kf_p_wc),
                uv=np.asarray(state.kf_feat.uv),
                desc=np.asarray(state.kf_feat.desc),
                kp_mask=np.asarray(state.kf_feat.mask),
            ))
        if j == 30:
            # Inject the kind of drift a long outage accumulates.
            state = state._replace(p_wc=state.p_wc + drift,
                                   kf_p_wc=state.kf_p_wc + drift)
    assert len(archive) >= 5
    err_before = np.linalg.norm(np.asarray(state.p_wc) - seq["gt_pos"][39])
    assert err_before > 0.3  # the injected drift persisted through dead-reckon

    f = extract_features(jnp.asarray(seq["images"][39], jnp.float32),
                         eng.cfg.frontend)
    r = attempt_relocalization(
        np.asarray(f.uv), np.asarray(f.desc), np.asarray(f.mask),
        archive, calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert r.success, (r.n_inliers, r.rmse)
    state = eng.relocalize(state, seq["images"][39], r.R_wc, r.p_wc)
    err_after = np.linalg.norm(np.asarray(state.p_wc) - seq["gt_pos"][39])
    assert err_after < 0.5 * err_before, (err_before, err_after)


def test_keyframes_from_scan_archive():
    """Scan outputs -> keyframe archive -> loop correction runs end-to-end."""
    from vislam_tpu.backend.trajectory_opt import correct_trajectory
    from vislam_tpu.engine import make_sequence_inputs, run_sequence_scan

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=24, n_landmarks=300, seed=0))
    eng = VIOEngine(seq["calib"])
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    inputs = make_sequence_inputs(seq)
    _, results = run_sequence_scan(eng, state0, inputs,
                                   kf_gt_pos0=seq["gt_pos"][0])
    recs = keyframes_from_scan(inputs.images, results, eng.cfg.frontend,
                               frame_offset=1)
    n_kf = int(np.asarray(results.is_keyframe).sum())
    assert len(recs) == n_kf >= 3
    # Record poses match the scan's outputs at the promoted rows.
    kf_rows = np.nonzero(np.asarray(results.is_keyframe))[0]
    np.testing.assert_allclose(
        recs[0].p_wc, np.asarray(results.p_wc[kf_rows[0]]), atol=1e-6)
    assert recs[0].frame_index == kf_rows[0] + 1
    assert recs[0].kp_mask.sum() > 100  # features actually extracted
    # The archive feeds the offline loop corrector without error.
    calib = seq["calib"]
    p_corr, R_corr, info = correct_trajectory(
        recs, calib.fx, calib.fy, calib.cx, calib.cy)
    assert p_corr.shape == (len(recs), 3)
    assert np.isfinite(p_corr).all()


def test_relocalize_recovers_nonfinite_state():
    """Divergence recovery: relocalize must produce a fully finite state even
    when the carried-over velocity/bias went NaN (the CLI's maybe_recover
    guard re-anchors through this path)."""
    import jax

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=6, n_landmarks=200, seed=0))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    bad = jnp.full(3, jnp.nan)
    state = state._replace(v_w=bad, bias_g=bad, bias_a=bad,
                           p_wc=bad, kf_p_wc=bad)
    from scipy.spatial.transform import Rotation as Rsp

    R_wc = Rsp.from_quat(np.roll(seq["gt_quat"][2], -1)).as_matrix()
    state2 = eng.relocalize(state, seq["images"][2], R_wc, seq["gt_pos"][2])
    for leaf in jax.tree.leaves(state2):
        assert np.isfinite(np.asarray(leaf, np.float64)).all() if \
            np.issubdtype(np.asarray(leaf).dtype, np.floating) else True
    imu = np.zeros((16, 6), np.float32)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    state3, res = eng.step(state2, seq["images"][3], imu, dt, 0.05)
    assert np.isfinite(np.asarray(res.p_wc)).all()
