"""Tests for auxiliary subsystems: viz plots, checkpoint/resume, KITTI/TUM
readers on generated native-format fixtures, timing stats."""

import os

import numpy as np
import pytest

from vislam_tpu.data import KittiDataset, TumDataset, SyntheticConfig, make_synthetic_sequence


def test_stage_timer_report():
    import time

    from vislam_tpu.utils.timing import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.count["a"] == 2
    assert t.mean_ms("a") >= 8.0
    rep = t.report()
    assert "a" in rep and "b" in rep


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=80, seed=6))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0])
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, frame_index=7, meta={"seq": "synthetic"})
    state2, fidx = load_checkpoint(path)
    assert fidx == 7
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # The restored state must be steppable.
    imu = np.zeros((16, 6), np.float32)
    dt = np.zeros(16, np.float32)
    s3, res = eng.step(state2, seq["images"][1], imu, dt, 0.01)
    assert np.isfinite(np.asarray(res.p_wc)).all()


def test_checkpoint_legacy_migration(tmp_path):
    """A checkpoint saved BEFORE EngineState grew its trailing fields
    (vi_aligned in round 3; kf_depths/kf_depth_valid in round 4) must still
    load, filling the new fields from their registered defaults (round-4
    advisor fix; shaped defaults recover K from the stored kf_feat.uv)."""
    import jax

    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=80, seed=6))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0])
    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state, frame_index=3)

    # Rewrite the file as a pre-versioning checkpoint: positional keys
    # only (no __paths), with every post-r2 trailing leaf dropped.
    data = dict(np.load(path))
    paths = [str(p) for p in data.pop("__paths")]
    drop = [i for i, p in enumerate(paths)
            if ("vi_aligned" in p or "kf_depths" in p
                or "kf_depth_valid" in p or "shadow_" in p
                or "origin_p_wc" in p or "bootstrap_applies" in p
                or "vi_engaged" in p)]
    assert len(drop) == 11  # r3: vi_aligned; r4: depths+shadow(6); r5: 4
    n = sum(1 for k in data if k.startswith("leaf_"))
    legacy = {"__frame_index": data["__frame_index"]}
    j = 0
    for i in range(n):
        if i in drop:
            continue
        legacy[f"leaf_{j}"] = data[f"leaf_{i}"]
        j += 1
    legacy_path = str(tmp_path / "legacy.npz")
    np.savez(legacy_path, **legacy)

    state2, fidx = load_checkpoint(legacy_path)
    assert fidx == 3
    assert bool(np.asarray(state2.vi_aligned)) is False
    assert state2.kf_depths.shape == state.kf_depths.shape
    assert not np.asarray(state2.kf_depth_valid).any()
    # All surviving leaves intact.
    l_old = jax.tree.leaves(state)
    l_new = jax.tree.leaves(state2)
    assert len(l_old) == len(l_new)


@pytest.fixture
def kitti_fixture(tmp_path):
    import cv2

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=16, n_landmarks=60, seed=7))
    root = tmp_path / "kitti"
    img_dir = root / "sequences" / "00" / "image_0"
    os.makedirs(img_dir)
    os.makedirs(root / "poses")
    for i, img in enumerate(seq["images"]):
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
    times = np.arange(len(seq["images"])) * 0.1
    np.savetxt(str(root / "sequences" / "00" / "times.txt"), times, fmt="%.6f")
    from scipy.spatial.transform import Rotation as Rsp

    with open(root / "poses" / "00.txt", "w") as f:
        for q, p in zip(seq["gt_quat"], seq["gt_pos"]):
            R = Rsp.from_quat(np.roll(q, -1)).as_matrix()
            P = np.hstack([R, p[:, None]])
            f.write(" ".join(f"{x:.9f}" for x in P.reshape(-1)) + "\n")
    return str(root), seq


def test_kitti_reader(kitti_fixture):
    root, seq = kitti_fixture
    ds = KittiDataset(root, "00")
    assert len(ds) == 16
    fw = ds.frame_window(5)
    assert fw.imu_count == 0
    np.testing.assert_array_equal(fw.image, seq["images"][5])
    np.testing.assert_allclose(fw.gt_pos, seq["gt_pos"][5], atol=1e-8)
    # Quaternion matches up to sign.
    assert abs(np.dot(fw.gt_quat, seq["gt_quat"][5])) > 0.9999


@pytest.fixture
def tum_fixture(tmp_path):
    import cv2

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=12, n_landmarks=60, seed=8))
    root = tmp_path / "tum"
    os.makedirs(root / "rgb")
    t0 = 1_300_000_000.0
    with open(root / "rgb.txt", "w") as f:
        f.write("# color images\n")
        for i, img in enumerate(seq["images"]):
            t = t0 + i * 0.05
            name = f"rgb/{t:.6f}.png"
            cv2.imwrite(str(root / name), img)
            f.write(f"{t:.6f} {name}\n")
    with open(root / "groundtruth.txt", "w") as f:
        f.write("# ground truth\n")
        for i, (q, p) in enumerate(zip(seq["gt_quat"], seq["gt_pos"])):
            t = t0 + i * 0.05
            f.write(
                f"{t:.6f} {p[0]} {p[1]} {p[2]} {q[1]} {q[2]} {q[3]} {q[0]}\n"
            )
    with open(root / "accelerometer.txt", "w") as f:
        f.write("# accelerometer\n")
        for i in range(len(seq["imu_t_ns"])):
            t = t0 + i * 0.005
            a = seq["imu_accel"][i]
            f.write(f"{t:.6f} {a[0]} {a[1]} {a[2]}\n")
    return str(root), seq


def test_tum_reader(tum_fixture):
    root, seq = tum_fixture
    ds = TumDataset(root)
    assert len(ds) == 12
    fw = ds.frame_window(4)
    np.testing.assert_array_equal(fw.image, seq["images"][4])
    np.testing.assert_allclose(fw.gt_pos, seq["gt_pos"][4], atol=1e-6)
    assert abs(np.dot(fw.gt_quat, seq["gt_quat"][4])) > 0.9999
    # Accel-only IMU rows: gyro zeros, accel filled.
    assert fw.imu_count == 10
    assert np.all(fw.imu[:10, :3] == 0)
    assert np.any(fw.imu[:10, 3:] != 0)


def test_viz_plots(tmp_path):
    from vislam_tpu.eval import write_trajectory_csv, read_trajectory_csv
    from vislam_tpu.viz import plot_trajectory, plot_state_comparison, draw_matches

    n = 20
    rows = []
    rng = np.random.default_rng(0)
    for j in range(n):
        p = np.array([j * 0.1, np.sin(j * 0.3), 0.0])
        rows.append(dict(
            frame=j, t_ns=int(1e9 * j * 0.05), is_kf=(j % 3 == 0),
            est_p=p + 0.01 * rng.standard_normal(3),
            est_rpy=np.zeros(3), est_q=[1, 0, 0, 0], est_v=np.zeros(3),
            gt_p=p, gt_rpy=np.zeros(3), gt_q=[1, 0, 0, 0], gt_v=np.zeros(3),
        ))
    csv = str(tmp_path / "t.csv")
    write_trajectory_csv(csv, rows)
    traj = read_trajectory_csv(csv)
    p1 = str(tmp_path / "traj.png")
    p2 = str(tmp_path / "state.png")
    plot_trajectory(traj, p1, align=True)
    plot_state_comparison(traj, p2)
    assert os.path.getsize(p1) > 10000
    assert os.path.getsize(p2) > 10000

    img = rng.integers(0, 255, (120, 160), np.uint8).astype(np.float32)
    uv = rng.uniform(0, 100, (30, 2)).astype(np.float32)
    p3 = str(tmp_path / "matches.png")
    draw_matches(img, uv, img, uv + 2, np.ones(30, bool), p3)
    assert os.path.getsize(p3) > 10000


def test_live_viz_snapshots(tmp_path):
    """LiveViz re-renders atomically every N keyframes and on close."""
    from vislam_tpu.viz import LiveViz

    import numpy as np

    lv = LiveViz(str(tmp_path / "run"), every_kf=2)
    rng = np.random.default_rng(0)
    p = np.zeros(3)
    for j in range(10):
        p = p + rng.normal(0, 0.1, 3)
        lv.update(j, p, p + 0.01, is_keyframe=(j % 2 == 0))
    out = lv.close()
    assert out is not None
    import os

    assert os.path.exists(out)
    assert lv._renders >= 3  # periodic renders happened, not just close()
    assert not os.path.exists(str(tmp_path / "run") + "_live.tmp.png")


def test_tum_trajectory_roundtrip(tmp_path):
    """TUM-format writer/reader round-trip (evo-toolchain interchange)."""
    import numpy as np

    from vislam_tpu.eval import read_trajectory_tum, write_trajectory_tum

    rng = np.random.default_rng(0)
    rows = []
    for j in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        rows.append(dict(t_ns=int(1e12 + j * 5e7), est_p=rng.normal(size=3),
                         est_q=q))
    path = str(tmp_path / "traj_tum.txt")
    write_trajectory_tum(path, rows)
    out = read_trajectory_tum(path)
    assert out["p"].shape == (5, 3)
    np.testing.assert_allclose(
        out["p"], np.stack([r["est_p"] for r in rows]), rtol=1e-12)
    np.testing.assert_allclose(
        out["q_wxyz"], np.stack([r["est_q"] for r in rows]), rtol=1e-12)
    np.testing.assert_allclose(out["t"][1] - out["t"][0], 0.05, atol=1e-9)
