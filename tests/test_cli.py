"""CLI surface tests: synthetic run and EUROC-fixture run must produce a
valid trajectory CSV and report ATE."""

import subprocess
import sys
import os

import numpy as np
import pytest

from vislam_tpu.eval import read_trajectory_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "vislam_tpu.cli", "--cpu", *args],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=500,
    )


def test_cli_synthetic(tmp_path):
    out = str(tmp_path / "traj.csv")
    r = _run_cli(["--synthetic", "18", "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ATE RMSE" in r.stdout
    data = read_trajectory_csv(out)
    assert len(data["frame"]) == 17
    assert np.isfinite(data["est_p"]).all()


def test_cli_euroc_fixture(tmp_path):
    from vislam_tpu.data import SyntheticConfig, write_euroc_fixture

    ds_dir = str(tmp_path / "seq")
    write_euroc_fixture(
        ds_dir, SyntheticConfig(n_frames=18, n_landmarks=150, seed=5),
        static_prefix_s=1.0,
    )
    out = str(tmp_path / "traj.csv")
    # The synthetic fixture uses the synthetic pinhole, not EUROC optics; pass
    # calibration via a generated OpenCV XML to exercise that load path.
    import cv2

    from vislam_tpu.data.synthetic import synthetic_calib

    calib = synthetic_calib()
    xml = str(tmp_path / "calib.xml")
    fs = cv2.FileStorage(xml, cv2.FILE_STORAGE_WRITE)
    fs.write("camera_matrix", calib.K)
    fs.write("distortion_coefficients", np.asarray(calib.dist))
    fs.write("image_width", calib.width)
    fs.write("image_height", calib.height)
    fs.write("camera_rate", 20.0)
    fs.write("imu_rate", 200.0)
    fs.release()

    r = _run_cli(["--dataset", ds_dir, "--calibration", xml, "--output", out])
    assert r.returncode == 0, r.stderr[-2000:]
    data = read_trajectory_csv(out)
    assert len(data["frame"]) >= 10
    assert np.isfinite(data["est_p"]).all()
    # GT columns present (fixture has ground truth).
    assert np.isfinite(data["gt_p"]).all()
