"""Tests for the camera model against OpenCV as oracle."""

import cv2
import jax.numpy as jnp
import numpy as np

from vislam_tpu.calib import (
    compute_undistort_maps,
    distort_normalized,
    euroc_calib,
    project_points,
    remap_bilinear,
    undistort_normalized,
    unproject_pixels,
)


def test_distort_matches_opencv(rng):
    calib = euroc_calib()
    pts = rng.uniform(-0.5, 0.5, size=(200, 2)).astype(np.float64)
    ours = np.asarray(distort_normalized(jnp.asarray(pts), calib.dist))
    # OpenCV oracle: projectPoints of (x, y, 1) with K=I applies pure distortion.
    obj = np.concatenate([pts, np.ones((200, 1))], -1)
    ref, _ = cv2.projectPoints(
        obj, np.zeros(3), np.zeros(3), np.eye(3), np.asarray(calib.dist)
    )
    np.testing.assert_allclose(ours, ref[:, 0, :], atol=1e-6)  # f32 compute


def test_undistort_roundtrip():
    calib = euroc_calib()
    xn = np.mgrid[-0.6:0.6:9j, -0.4:0.4:9j].reshape(2, -1).T
    xd = distort_normalized(jnp.asarray(xn), calib.dist)
    back = np.asarray(undistort_normalized(xd, calib.dist, iters=12))
    np.testing.assert_allclose(back, xn, atol=1e-6)


def test_project_unproject_roundtrip(rng):
    calib = euroc_calib()
    X = np.stack(
        [rng.uniform(-2, 2, 100), rng.uniform(-1.5, 1.5, 100), rng.uniform(2, 10, 100)], -1
    )
    uv = project_points(
        jnp.asarray(X), calib.fx, calib.fy, calib.cx, calib.cy, calib.dist
    )
    rays = np.asarray(
        unproject_pixels(uv, calib.fx, calib.fy, calib.cx, calib.cy, calib.dist)
    )
    dirs = X / X[:, 2:3]
    np.testing.assert_allclose(rays, dirs, atol=1e-5)


def test_undistort_maps_against_opencv():
    calib = euroc_calib()
    maps, new_calib = compute_undistort_maps(calib, alpha=0.0)
    # Oracle: OpenCV's own rectify maps under the same new camera matrix.
    K_new = np.array(
        [[new_calib.fx, 0, new_calib.cx], [0, new_calib.fy, new_calib.cy], [0, 0, 1]]
    )
    m1, m2 = cv2.initUndistortRectifyMap(
        calib.K, np.asarray(calib.dist), None, K_new,
        (calib.width, calib.height), cv2.CV_32FC1,
    )
    np.testing.assert_allclose(maps[..., 0], m1, atol=5e-2)
    np.testing.assert_allclose(maps[..., 1], m2, atol=5e-2)


def test_remap_matches_opencv(rng):
    calib = euroc_calib()
    maps, _ = compute_undistort_maps(calib, alpha=0.0)
    img = rng.integers(0, 255, size=(calib.height, calib.width), dtype=np.uint8)
    ours = np.asarray(remap_bilinear(jnp.asarray(img), jnp.asarray(maps)))
    ref = cv2.remap(
        img, maps[..., 0], maps[..., 1], cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_CONSTANT, borderValue=0,
    )
    # Interior should agree to within a quantization step.
    diff = np.abs(ours[5:-5, 5:-5] - ref[5:-5, 5:-5].astype(np.float32))
    assert np.percentile(diff, 99) <= 1.5
    assert diff.mean() < 0.5
