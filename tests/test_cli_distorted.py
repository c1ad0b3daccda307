"""End-to-end on a DISTORTED fixture: synthesize lens distortion on the
synthetic images, hand the CLI the distortion-bearing calibration, and check
that the built-in undistortion recovers trackable geometry."""

import os
import subprocess
import sys

import numpy as np

from vislam_tpu.eval import read_trajectory_csv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cli_undistorts_distorted_fixture(tmp_path):
    import cv2
    import jax
    import jax.numpy as jnp

    from vislam_tpu.calib.camera_model import (
        CameraCalib, remap_bilinear, undistort_normalized,
    )
    from vislam_tpu.data import SyntheticConfig, write_euroc_fixture
    from vislam_tpu.data.synthetic import synthetic_calib

    ds_dir = str(tmp_path / "seq")
    cfg = SyntheticConfig(n_frames=18, n_landmarks=200, seed=33)
    seq = write_euroc_fixture(ds_dir, cfg, static_prefix_s=0.5)
    clean = synthetic_calib()

    # Synthesize distortion: for each distorted pixel, find where the clean
    # (rectified) image must be sampled — dist_img = remap(clean, K_rect o
    # undistort o K^-1). Mild radial distortion.
    dist = (-0.15, 0.03, 0.0, 0.0)
    H, W = clean.height, clean.width
    vv, uu = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    xd = np.stack(
        [(uu - clean.cx) / clean.fx, (vv - clean.cy) / clean.fy], -1
    ).astype(np.float32)
    xn = np.asarray(undistort_normalized(jnp.asarray(xd), dist, iters=10))
    maps_d = np.stack(
        [xn[..., 0] * clean.fx + clean.cx, xn[..., 1] * clean.fy + clean.cy], -1
    ).astype(np.float32)

    cam_dir = os.path.join(ds_dir, "mav0", "cam0", "data")
    for name in sorted(os.listdir(cam_dir)):
        img = cv2.imread(os.path.join(cam_dir, name), cv2.IMREAD_GRAYSCALE)
        warped = np.asarray(
            remap_bilinear(jnp.asarray(img, jnp.float32), jnp.asarray(maps_d))
        )
        cv2.imwrite(os.path.join(cam_dir, name),
                    np.clip(warped, 0, 255).astype(np.uint8))

    # Calibration XML carrying the distortion (what a real sensor ships).
    xml = str(tmp_path / "calib.xml")
    fs = cv2.FileStorage(xml, cv2.FILE_STORAGE_WRITE)
    fs.write("camera_matrix", clean.K)
    fs.write("distortion_coefficients", np.asarray(dist))
    fs.write("image_width", W)
    fs.write("image_height", H)
    fs.write("camera_rate", 20.0)
    fs.write("imu_rate", 200.0)
    fs.release()

    out = str(tmp_path / "traj.csv")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "vislam_tpu.cli", "--cpu",
         "--dataset", ds_dir, "--calibration", xml, "--output", out],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=540,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "undistort" in r.stdout  # per-stage timer shows the remap ran
    data = read_trajectory_csv(out)
    assert np.isfinite(data["est_p"]).all()
    # Tracking quality on the undistorted stream: position error bounded.
    err = np.linalg.norm(data["est_p"] - data["gt_p"], axis=-1)
    assert err.max() < 0.6, err.max()
