"""CLI on a KITTI-layout fixture (vision-only mode auto-enabled)."""

import os
import subprocess
import sys

import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.eval import read_trajectory_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_kitti_fixture(tmp_path):
    import cv2
    from scipy.spatial.transform import Rotation as Rsp

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=16, n_landmarks=200, seed=15))
    root = tmp_path / "kitti"
    img_dir = root / "sequences" / "00" / "image_0"
    os.makedirs(img_dir)
    os.makedirs(root / "poses")
    for i, img in enumerate(seq["images"]):
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
    np.savetxt(str(root / "sequences" / "00" / "times.txt"),
               np.arange(16) * 0.05, fmt="%.6f")
    with open(root / "poses" / "00.txt", "w") as f:
        for q, p in zip(seq["gt_quat"], seq["gt_pos"]):
            R = Rsp.from_quat(np.roll(q, -1)).as_matrix()
            f.write(" ".join(f"{x:.9f}" for x in np.hstack([R, p[:, None]]).reshape(-1)) + "\n")

    # KITTI preset has the wrong intrinsics for the synthetic camera: write
    # the correct XML (exercises the format+custom-calibration combination).
    from vislam_tpu.data.synthetic import synthetic_calib

    calib = synthetic_calib()
    xml = str(tmp_path / "calib.xml")
    fs = cv2.FileStorage(xml, cv2.FILE_STORAGE_WRITE)
    fs.write("camera_matrix", calib.K)
    fs.write("distortion_coefficients", np.asarray(calib.dist))
    fs.write("image_width", calib.width)
    fs.write("image_height", calib.height)
    fs.release()

    out = str(tmp_path / "traj.csv")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "vislam_tpu.cli", "--cpu",
         "--dataset", str(root), "--format", "kitti", "--sequence", "00",
         "--calibration", xml, "--output", out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=500,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = read_trajectory_csv(out)
    # 16 images: frame 1 initializes the engine, frames 2..15 are processed.
    assert len(data["frame"]) == 14
    assert np.isfinite(data["est_p"]).all()
    assert np.isfinite(data["gt_p"]).all()
