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


def test_direction_trigger_rescues_period_aliasing():
    """Round-3 failure-mode detector: period-aliased solves can carry
    RANSAC-consistent-but-wrong translation directions. The direction
    trigger (solved translation vs IMU prediction) must engage the rescue
    on such frames EVEN WITH THE INLIER FLOOR DISABLED (proving it is the
    direction signal, not the floor, that detects the failure mode) and
    improve the direction agreement; and it must stay bit-neutral on
    healthy scenes."""
    import dataclasses

    import vislam_tpu.data.adversarial as adv
    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.utils.config import SystemConfig

    seq = adv.make_adversarial_sequence(adv.AdversarialConfig(
        n_frames=16, texture="repetitive", gyro_noise=0.002,
        accel_noise=0.02, trans_amp=(3.0, 2.0, 1.0)))

    def run(sq, fb_px, floor):
        c = SystemConfig()
        c = dataclasses.replace(c, frontend=dataclasses.replace(
            c.frontend, guided_fallback_px=fb_px,
            fallback_trigger_inliers=floor))
        eng = VIOEngine(sq["calib"], c)
        state = eng.initialize(
            sq["images"][0], q_wb0=sq["gt_quat"][0],
            v_w0=sq["gt_vel"][0], p_w0=sq["gt_pos"][0])
        rows = []
        last_kf = 0
        for j in range(1, len(sq["images"])):
            lo, hi = (j - 1) * 10, j * 10
            imu = np.zeros((16, 6), np.float32)
            imu[:10] = np.concatenate(
                [sq["imu_gyro"][lo:hi], sq["imu_accel"][lo:hi]], -1)
            dt = np.zeros(16, np.float32)
            dt[:10] = 1 / 200.0
            gt_norm = float(np.linalg.norm(
                sq["gt_pos"][j] - sq["gt_pos"][last_kf]))
            state, res = eng.step(state, sq["images"][j], imu, dt, gt_norm)
            if bool(res.is_keyframe):
                last_kf = j
            tp = np.asarray(res.t_pred_cam)
            pn = float(np.linalg.norm(tp))
            cosang = float(tp @ np.asarray(res.t_dir_cam) / max(pn, 1e-9))
            rows.append(dict(inl=int(res.num_inliers), pn=pn, cos=cosang,
                             fb=bool(res.used_fallback),
                             p=np.asarray(res.p_wc)))
        return rows

    off = run(seq, 0.0, 12)
    # Aliased frames exist (direction disagrees while the IMU reports
    # meaningful motion).
    aliased = [r for r in off if r["cos"] < 0.4 and r["pn"] > 0.03]
    assert aliased, [round(r["cos"], 2) for r in off]

    # Direction-ONLY trigger (inlier floor disabled): must still engage.
    on = run(seq, 60.0, 0)
    assert any(r["fb"] for r in on)
    m_off = np.mean([r["cos"] for r in off])
    m_on = np.mean([r["cos"] for r in on])
    assert m_on > m_off, (m_on, m_off)
    assert np.isfinite(np.stack([r["p"] for r in on])).all()

    # Healthy scene: the direction trigger must never fire (bit-neutral).
    good = make_synthetic_sequence(
        SyntheticConfig(n_frames=10, n_landmarks=300, seed=0))
    h_off = run(good, 0.0, 12)
    h_on = run(good, 60.0, 12)
    assert not any(r["fb"] for r in h_on)
    np.testing.assert_array_equal(
        np.stack([r["p"] for r in h_on]), np.stack([r["p"] for r in h_off]))


def test_gtfree_rescue_scale_decoupled():
    """Round 4: the rescue TRIGGER fires in GT-free (IMU-scale) mode, but
    acceptance toward the IMU direction stays GT-scale-only — GT-free
    rescues accept purely on the scale-decoupled inlier win. Regression
    guard for the round-3 feedback loop (accepting toward the IMU in
    GT-free mode corrupted drifting runs, 0.30 -> 1.13): a GT-free
    aggressive VI-BA run with the trigger live must be as accurate as the
    round-3 trigger-gated configuration."""
    import dataclasses

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    seq = make_synthetic_sequence(SyntheticConfig(
        n_frames=40, n_landmarks=350, seed=1,
        trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3)))

    def run(dir_cos):
        c = SystemConfig()
        c = dataclasses.replace(
            c,
            frontend=dataclasses.replace(c.frontend,
                                         fallback_dir_cos=dir_cos),
            backend=dataclasses.replace(c.backend, vi_factors=True),
        )
        calib = seq["calib"]
        eng = VIOEngine(calib, c)
        state = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
        poses = []
        for j in range(1, len(seq["images"])):
            lo, hi = (j - 1) * 10, j * 10
            imu = np.zeros((16, 6), np.float32)
            imu[:10] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
            dt = np.zeros(16, np.float32)
            dt[:10] = 1 / 200.0
            state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
            if bool(res.is_keyframe):
                state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                      calib.cx, calib.cy)
            poses.append(np.asarray(state.p_wc))
        return float(ate_rmse(np.array(poses),
                              seq["gt_pos"][1:len(seq["images"])],
                              align=False))

    ate_live = run(0.4)      # trigger armed (default)
    ate_off = run(-2.0)      # direction trigger can never fire
    # The armed GT-free trigger must not measurably harm the run (the
    # round-3 feedback loop cost ~4x here).
    assert ate_live < ate_off * 1.15 + 0.02, (ate_live, ate_off)
