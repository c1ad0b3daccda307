"""Engine robustness: degenerate visual input must fall back to IMU without
NaNs; static scenes must not spam keyframes."""

import numpy as np
import pytest

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine


@pytest.fixture(scope="module")
def eng_state():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=3, n_landmarks=200, seed=5))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    return seq, eng, state


def _imu_window(seq, j):
    lo, hi = (j - 1) * 10, j * 10
    imu = np.zeros((16, 6), np.float32)
    imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    return imu, dt


def test_blank_image_falls_back_to_imu(eng_state):
    seq, eng, state = eng_state
    blank = np.zeros_like(seq["images"][1])
    imu, dt = _imu_window(seq, 1)
    state2, res = eng.step(state, blank, imu, dt, 0.05)
    assert not bool(res.is_keyframe)
    assert np.isfinite(np.asarray(res.p_wc)).all()
    assert np.isfinite(np.asarray(res.R_wc)).all()
    # Pose should be near the IMU prediction, not garbage.
    assert np.linalg.norm(np.asarray(res.p_wc) - seq["gt_pos"][1]) < 0.5


def test_noise_image_no_nan(eng_state):
    seq, eng, state = eng_state
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 255, seq["images"][1].shape).astype(np.uint8)
    imu, dt = _imu_window(seq, 1)
    state2, res = eng.step(state, noise, imu, dt, 0.05)
    assert np.isfinite(np.asarray(res.p_wc)).all()
    assert np.isfinite(np.asarray(state2.v_w)).all()


def test_static_scene_no_keyframes(eng_state):
    seq, eng, _ = eng_state
    # Stationary premise needs a stationary init (zero velocity).
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                           v_w0=np.zeros(3), p_w0=seq["gt_pos"][0])
    # Same image repeatedly + stationary IMU: zero disparity, no keyframes.
    imu = np.zeros((16, 6), np.float32)
    imu[:10, 5] = 9.81
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    kf_count0 = int(state.kf_count)
    s = state
    for _ in range(5):
        s, res = eng.step(s, seq["images"][0], imu, dt, 0.0)
        assert not bool(res.is_keyframe)
    assert int(s.kf_count) == kf_count0
    assert np.isfinite(np.asarray(s.p_wc)).all()
    # Position stays ~where it started (gravity cancels measured accel up to
    # the tilt of the synthetic initial attitude).
    assert np.linalg.norm(np.asarray(s.p_wc) - np.asarray(state.p_wc)) < 0.1


def test_imu_outage_integration(eng_state):
    """Visual outage (blank frames) must keep integrating IMU displacement
    rather than freezing at the last keyframe."""
    seq, eng, _ = eng_state
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                           v_w0=np.asarray([1.0, 0, 0], np.float32),
                           p_w0=np.zeros(3))
    imu = np.zeros((16, 6), np.float32)
    imu[:10, 5] = 9.81  # stationary specific force: world accel ~ 0
    dt = np.zeros(16, np.float32)
    dt[:10] = 1 / 200.0
    blank = np.zeros_like(seq["images"][0])
    s = state
    for _ in range(4):
        s, res = eng.step(s, blank, imu, dt, -1.0)
    # 4 frames * 0.05 s * 1 m/s = 0.2 m along x.
    p = np.asarray(s.p_wc)
    assert 0.1 < p[0] < 0.3, p


def test_saturated_image(eng_state):
    seq, eng, state = eng_state
    white = np.full_like(seq["images"][1], 255)
    imu, dt = _imu_window(seq, 1)
    _, res = eng.step(state, white, imu, dt, 0.05)
    assert np.isfinite(np.asarray(res.p_wc)).all()


def test_guided_fallback_rescue_semantics():
    """Rescue-only guided fallback: (a) bit-exact neutral on healthy scenes
    (the trigger must never fire), (b) engages on near-identical repetitive
    texture under fast motion + blur and lifts the inlier count."""
    import dataclasses

    import vislam_tpu.data.adversarial as adv
    from vislam_tpu.data.synthetic import synthetic_calib
    from vislam_tpu.utils.config import SystemConfig

    def run(seq, fb_px):
        c = SystemConfig()
        c = dataclasses.replace(c, frontend=dataclasses.replace(
            c.frontend, guided_fallback_px=fb_px))
        eng = VIOEngine(seq["calib"], c)
        state = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
        )
        inl, fbs, ps = [], [], []
        last_kf = 0
        for j in range(1, len(seq["images"])):
            lo, hi = (j - 1) * 10, j * 10
            imu = np.zeros((16, 6), np.float32)
            imu[:10] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
            dt = np.zeros(16, np.float32)
            dt[:10] = 1 / 200.0
            gt_norm = float(np.linalg.norm(
                seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
            state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
            if bool(res.is_keyframe):
                last_kf = j
            inl.append(int(res.num_inliers))
            fbs.append(bool(res.used_fallback))
            ps.append(np.asarray(res.p_wc))
        return inl, fbs, np.array(ps)

    # (a) healthy oracle: trigger never fires, trajectories bit-identical.
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=10, n_landmarks=300, seed=0))
    inl0, fb0, p0 = run(seq, 0.0)
    inl1, fb1, p1 = run(seq, 60.0)
    assert not any(fb1)
    np.testing.assert_array_equal(p0, p1)

    # (b) near-identical bricks + fast motion + blur: rescue engages and
    # lifts the inlier count on the engaged frames.
    orig = adv.brick_texture
    adv.brick_texture = lambda rng, size=1024, **kw: orig(
        rng, size, variation=0.012, grain=0.010)
    try:
        hard = adv.make_adversarial_sequence(
            adv.AdversarialConfig(
                n_frames=10, texture="repetitive",
                rot_amp=(0.12, 0.15, 0.35), trans_amp=(2.5, 1.6, 0.8),
                blur_samples=3, exposure_s=0.035,
                gyro_noise=0.002, accel_noise=0.02,
            ),
            synthetic_calib(376, 240),
        )
    finally:
        adv.brick_texture = orig
    inl_off, fb_off, _ = run(hard, 0.0)
    inl_on, fb_on, p_on = run(hard, 60.0)
    assert not any(fb_off)
    assert any(fb_on), inl_off  # the rescue engaged
    assert sum(inl_on) >= sum(inl_off)
    assert np.isfinite(p_on).all()
