"""Golden-file tests for the EUROC reader on a generated fixture, plus
consistency checks on the synthetic generator itself."""

import numpy as np
import pytest

from vislam_tpu.data import (
    EurocDataset,
    PrefetchLoader,
    SyntheticConfig,
    make_synthetic_sequence,
    write_euroc_fixture,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("euroc_fixture")
    cfg = SyntheticConfig(n_frames=20, n_landmarks=120, seed=3)
    seq = write_euroc_fixture(str(path), cfg, static_prefix_s=1.0)
    return str(path), seq


def test_reader_roundtrips_fixture(fixture_dir):
    path, seq = fixture_dir
    ds = EurocDataset(path)
    assert len(ds) == 20
    # Image timestamps parse back exactly from filename stems.
    np.testing.assert_array_equal(ds.image_t_ns, seq["t_cam_ns"])
    # Image content survives png roundtrip exactly (grayscale, lossless).
    img = ds.load_image(5)
    np.testing.assert_array_equal(img, seq["images"][5])


def test_frame_window_imu_slicing(fixture_dir):
    path, seq = fixture_dir
    ds = EurocDataset(path)
    fw = ds.frame_window(10)
    # EUROC rates: 200 Hz IMU / 20 Hz cam -> 10 samples per frame window.
    assert fw.imu_count == 10
    assert fw.imu.shape == (16, 6)
    # The samples must be exactly the rows with t in (t_9, t_10].
    t_i, t_j = seq["t_cam_ns"][9], seq["t_cam_ns"][10]
    mask = (seq["imu_t_ns"] > t_i) & (seq["imu_t_ns"] <= t_j)
    np.testing.assert_allclose(fw.imu[:10, :3], seq["imu_gyro"][mask], rtol=1e-6)
    np.testing.assert_allclose(fw.imu[:10, 3:], seq["imu_accel"][mask], rtol=1e-6)
    # dt sums to one camera period.
    np.testing.assert_allclose(fw.imu_dt.sum(), 0.05, atol=1e-6)
    # Padding is zero.
    assert np.all(fw.imu[10:] == 0)


def test_gt_nearest_sync(fixture_dir):
    path, seq = fixture_dir
    ds = EurocDataset(path)
    fw = ds.frame_window(7)
    np.testing.assert_allclose(fw.gt_pos, seq["gt_pos"][7], atol=1e-12)
    np.testing.assert_allclose(fw.gt_quat, seq["gt_quat"][7], atol=1e-12)
    np.testing.assert_allclose(fw.gt_vel, seq["gt_vel"][7], atol=1e-12)


def test_static_prefix_detected(fixture_dir):
    path, _ = fixture_dir
    ds = EurocDataset(path)
    gyro, accel = ds.static_imu_prefix(max_seconds=0.9)
    # The fixture prepends 1 s of stationary samples: gyro 0, accel +g on z.
    assert gyro.shape[0] >= 150
    np.testing.assert_allclose(gyro, 0.0, atol=1e-12)
    np.testing.assert_allclose(accel[:, 2], 9.81, atol=1e-6)


def test_prefetch_loader_order_and_content(fixture_dir):
    path, seq = fixture_dir
    ds = EurocDataset(path)
    frames = list(PrefetchLoader(ds, start=5, end=12))
    assert [f.index for f in frames] == list(range(5, 12))
    np.testing.assert_array_equal(frames[0].image, seq["images"][5])


def test_synthetic_imu_integrates_to_gt():
    """Dead-reckon the synthetic IMU and compare against its own GT — validates
    the generator's internal consistency (the oracle must be self-consistent
    before it can judge the engine)."""
    from scipy.spatial.transform import Rotation as R

    cfg = SyntheticConfig(n_frames=40, n_landmarks=10, seed=1)
    seq = make_synthetic_sequence(cfg)
    dt = 1.0 / 200.0
    g_w = np.array([0.0, 0.0, -cfg.gravity])

    Rwb = R.from_quat(np.roll(seq["gt_quat"][0], -1)).as_matrix()
    pos = seq["gt_pos"][0].copy()
    vel = seq["gt_vel"][0].copy()
    n = len(seq["imu_t_ns"]) - 1
    for k in range(n):
        acc_w = Rwb @ seq["imu_accel"][k] + g_w
        pos += vel * dt + 0.5 * acc_w * dt * dt
        vel += acc_w * dt
        Rwb = Rwb @ R.from_rotvec(seq["imu_gyro"][k] * dt).as_matrix()

    # ~2 s of integration; small drift only (generator consistency, not filter).
    assert np.linalg.norm(pos - seq["gt_pos"][-1]) < 0.05
    rot_err = R.from_matrix(
        Rwb.T @ R.from_quat(np.roll(seq["gt_quat"][-1], -1)).as_matrix()
    ).magnitude()
    assert rot_err < 0.02


def test_images_have_texture():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=3, n_landmarks=200, seed=2))
    img = seq["images"][0].astype(np.float32)
    assert img.std() > 10.0  # landmarks actually rendered
    assert (img > 60).mean() > 0.005
