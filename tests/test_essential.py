"""Essential-matrix RANSAC tests on exact synthetic geometry."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.frontend.essential import ransac_essential


def _scene(rng, M=256, rot=(0.04, -0.06, 0.03), t=(0.4, -0.1, 0.15),
           outlier_frac=0.0, noise=0.0):
    lm = np.stack(
        [rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(4, 12, M)], -1
    )
    R_rel = Rsp.from_rotvec(rot).as_matrix()
    t_rel = np.asarray(t)
    X_j = (lm - t_rel) @ R_rel
    rays_i = lm / np.linalg.norm(lm, axis=-1, keepdims=True)
    rays_j = X_j / np.linalg.norm(X_j, axis=-1, keepdims=True)
    if noise:
        rays_j = rays_j + noise * rng.standard_normal(rays_j.shape)
        rays_j /= np.linalg.norm(rays_j, axis=-1, keepdims=True)
    n_out = int(outlier_frac * M)
    if n_out:
        bad = rng.normal(size=(n_out, 3))
        bad /= np.linalg.norm(bad, axis=-1, keepdims=True)
        bad[:, 2] = np.abs(bad[:, 2])
        rays_j[:n_out] = bad
    R_ji = R_rel.T
    t_j = -R_rel.T @ t_rel
    return rays_i, rays_j, R_ji, t_j / np.linalg.norm(t_j)


def _angles(R_est, t_est, R_gt, t_gt):
    rot_err = np.degrees(
        np.linalg.norm(Rsp.from_matrix(np.asarray(R_est).T @ R_gt).as_rotvec())
    )
    t_err = np.degrees(
        np.arccos(np.clip(np.abs(np.dot(np.asarray(t_est), t_gt)), -1, 1))
    )
    sign_ok = float(np.dot(np.asarray(t_est), t_gt)) > 0
    return rot_err, t_err, sign_ok


def test_essential_exact(rng):
    rays_i, rays_j, R_gt, t_gt = _scene(rng)
    est = ransac_essential(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j, jnp.float32),
        jnp.ones(len(rays_i), bool), jax.random.PRNGKey(0),
    )
    rot_err, t_err, sign_ok = _angles(est.R_ji, est.t_dir, R_gt, t_gt)
    assert rot_err < 0.2, rot_err
    assert t_err < 1.0, t_err
    assert sign_ok
    assert int(est.num_inliers) > 240


def test_essential_with_outliers_and_noise(rng):
    rays_i, rays_j, R_gt, t_gt = _scene(rng, outlier_frac=0.25, noise=5e-4)
    est = ransac_essential(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j, jnp.float32),
        jnp.ones(len(rays_i), bool), jax.random.PRNGKey(1), num_hyps=512,
    )
    rot_err, t_err, sign_ok = _angles(est.R_ji, est.t_dir, R_gt, t_gt)
    assert rot_err < 1.5, rot_err
    # Translation direction is the noise-amplified quantity at small
    # baseline/depth ratios (~0.05 here); 8-point with 0.2 px noise lands
    # around 4-5 degrees.
    assert t_err < 6.0, t_err
    assert sign_ok


def test_essential_respects_mask(rng):
    rays_i, rays_j, R_gt, t_gt = _scene(rng)
    # Corrupt the masked-out half grossly; result must be unaffected.
    M = len(rays_i)
    mask = np.ones(M, bool)
    mask[: M // 2] = False
    rays_j2 = rays_j.copy()
    rays_j2[: M // 2] = rng.normal(size=(M // 2, 3))
    rays_j2[: M // 2] /= np.linalg.norm(rays_j2[: M // 2], axis=-1, keepdims=True)
    est = ransac_essential(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j2, jnp.float32),
        jnp.asarray(mask), jax.random.PRNGKey(2),
    )
    rot_err, t_err, _ = _angles(est.R_ji, est.t_dir, R_gt, t_gt)
    assert rot_err < 0.3 and t_err < 1.5
    # No masked row may count as inlier.
    assert not np.asarray(est.inlier_mask)[: M // 2].any()
