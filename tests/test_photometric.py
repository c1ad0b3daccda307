"""Photometric alignment tests: recover a known relative pose between two
rendered synthetic frames from a perturbed initialization."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.frontend import extract_features, build_pyramid
from vislam_tpu.backend.photometric import photometric_align
from vislam_tpu.utils.config import FrontendConfig


def _setup(seed=20):
    cfg = SyntheticConfig(n_frames=3, n_landmarks=350, seed=seed)
    seq = make_synthetic_sequence(cfg)
    calib = seq["calib"]
    R0 = Rsp.from_quat(np.roll(seq["gt_quat"][0], -1)).as_matrix()
    R1 = Rsp.from_quat(np.roll(seq["gt_quat"][1], -1)).as_matrix()
    p0, p1 = seq["gt_pos"][0], seq["gt_pos"][1]
    # True relative pose i=frame0 -> j=frame1.
    R_ji = R1.T @ R0
    t_ji = R1.T @ (p0 - p1)

    # Candidate points: detected keypoints in frame 0 with their TRUE depths
    # (computed from the landmark field: nearest landmark along the pixel).
    feats = extract_features(jnp.asarray(seq["images"][0], jnp.float32),
                             FrontendConfig())
    uv = np.asarray(feats.uv)
    m = np.asarray(feats.mask)
    Xc0 = (seq["landmarks"] - p0) @ R0
    z = Xc0[:, 2]
    ulm = calib.fx * Xc0[:, 0] / z + calib.cx
    vlm = calib.fy * Xc0[:, 1] / z + calib.cy
    d = np.linalg.norm(uv[:, None] - np.stack([ulm, vlm], -1)[None], axis=-1)
    nearest = d.argmin(1)
    depth = z[nearest].astype(np.float32)
    good = m & (d.min(1) < 3.0) & (depth > 0.5)
    return seq, calib, uv, depth, good, R_ji, t_ji


def test_photometric_recovers_pose_from_perturbation():
    seq, calib, uv, depth, good, R_ji, t_ji = _setup()
    pyr_i = build_pyramid(jnp.asarray(seq["images"][0], jnp.float32), 4)
    pyr_j = build_pyramid(jnp.asarray(seq["images"][1], jnp.float32), 4)

    # Perturb the true pose: 1 deg rotation, 5 cm translation.
    R_pert = Rsp.from_rotvec([0.01, -0.012, 0.008]).as_matrix() @ R_ji
    t_pert = t_ji + np.array([0.03, -0.04, 0.02])

    res = photometric_align(
        pyr_i, pyr_j,
        jnp.asarray(uv, jnp.float32), jnp.asarray(depth),
        jnp.asarray(good),
        jnp.asarray(R_pert, jnp.float32), jnp.asarray(t_pert, jnp.float32),
        calib.fx, calib.fy, calib.cx, calib.cy,
    )
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    rot_err = np.degrees(np.linalg.norm(Rsp.from_matrix(R_est.T @ R_ji).as_rotvec()))
    t_err = np.linalg.norm(t_est - t_ji)
    assert rot_err < 0.3, rot_err
    assert t_err < 0.02, t_err
    assert int(res.num_valid) > 100


def test_photometric_robust_to_bad_depths():
    seq, calib, uv, depth, good, R_ji, t_ji = _setup(seed=21)
    pyr_i = build_pyramid(jnp.asarray(seq["images"][0], jnp.float32), 4)
    pyr_j = build_pyramid(jnp.asarray(seq["images"][1], jnp.float32), 4)
    # Corrupt 10% of the depths grossly.
    rng = np.random.default_rng(0)
    depth_bad = depth.copy()
    idx = rng.choice(len(depth), len(depth) // 10, replace=False)
    depth_bad[idx] *= 3.0

    R_pert = Rsp.from_rotvec([0.008, 0.01, -0.006]).as_matrix() @ R_ji
    t_pert = t_ji + np.array([-0.03, 0.02, 0.03])
    res = photometric_align(
        pyr_i, pyr_j,
        jnp.asarray(uv, jnp.float32), jnp.asarray(depth_bad),
        jnp.asarray(good),
        jnp.asarray(R_pert, jnp.float32), jnp.asarray(t_pert, jnp.float32),
        calib.fx, calib.fy, calib.cx, calib.cy, robust=True,
    )
    R_est, t_est = np.asarray(res.R), np.asarray(res.t)
    rot_err = np.degrees(np.linalg.norm(Rsp.from_matrix(R_est.T @ R_ji).as_rotvec()))
    t_err = np.linalg.norm(t_est - t_ji)
    assert rot_err < 0.6, rot_err
    assert t_err < 0.04, t_err
