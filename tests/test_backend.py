"""Backend tests: triangulation against exact geometry and OpenCV, BA
convergence on synthetic windows with known ground truth."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.backend import (
    BAProblem,
    BAState,
    bundle_adjust,
    reprojection_residuals,
    triangulate_dlt,
    triangulate_midpoint,
)

FX = FY = 400.0
CX, CY = 376.0, 240.0


def _make_window(rng, W=5, L=64, noise_px=0.3, outlier_frac=0.0):
    """Synthetic BA window: poses on an arc, landmarks in front."""
    X = np.stack(
        [rng.uniform(-4, 4, L), rng.uniform(-3, 3, L), rng.uniform(6, 14, L)], -1
    )
    R_wc, t_wc = [], []
    for k in range(W):
        ang = 0.04 * k
        Rk = Rsp.from_euler("y", ang).as_matrix()
        pk = np.array([0.4 * k, 0.02 * k, 0.0])
        R_wc.append(Rk)
        t_wc.append(pk)
    # world->camera: Xc = R^T (X - p)
    R_cw = np.stack([R.T for R in R_wc])
    t_cw = np.stack([-R.T @ p for R, p in zip(R_wc, t_wc)])

    obs = np.zeros((W, L, 2), np.float32)
    mask = np.zeros((W, L), bool)
    for k in range(W):
        Xc = X @ R_cw[k].T + t_cw[k]
        z = Xc[:, 2]
        u = FX * Xc[:, 0] / z + CX
        v = FY * Xc[:, 1] / z + CY
        ok = (z > 0.5) & (u > 0) & (u < 752) & (v > 0) & (v < 480)
        obs[k, :, 0] = u + noise_px * rng.standard_normal(L)
        obs[k, :, 1] = v + noise_px * rng.standard_normal(L)
        mask[k] = ok
    if outlier_frac > 0:
        n_out = int(outlier_frac * W * L)
        ii = rng.integers(0, W, n_out)
        jj = rng.integers(0, L, n_out)
        obs[ii, jj] += rng.uniform(20, 80, (n_out, 2))
    return X, R_cw, t_cw, obs, mask


def test_triangulate_midpoint_exact(rng):
    M = 128
    X = np.stack([rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(4, 12, M)], -1)
    R_rel = Rsp.from_rotvec([0.05, -0.03, 0.01]).as_matrix()
    t_rel = np.array([0.3, 0.05, -0.1])
    X_j = (X - t_rel) @ R_rel
    rays_i = X / np.linalg.norm(X, axis=-1, keepdims=True)
    rays_j = X_j / np.linalg.norm(X_j, axis=-1, keepdims=True)
    R_ji = R_rel.T
    t_ji = -R_rel.T @ t_rel
    Xi, di, dj, gap = triangulate_midpoint(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j, jnp.float32),
        jnp.asarray(R_ji, jnp.float32), jnp.asarray(t_ji, jnp.float32),
    )
    Xi_true = rays_i * np.linalg.norm(X, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(Xi), Xi_true, atol=2e-2)
    assert np.all(np.asarray(di) > 0) and np.all(np.asarray(dj) > 0)
    assert np.asarray(gap).max() < 1e-3


def test_triangulate_dlt_matches_opencv(rng):
    M = 64
    X = np.stack([rng.uniform(-3, 3, M), rng.uniform(-2, 2, M), rng.uniform(4, 12, M)], -1)
    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
    R2 = Rsp.from_rotvec([0.03, 0.06, -0.02]).as_matrix()
    t2 = np.array([0.5, -0.1, 0.1])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([R2, t2[:, None]])
    uv1 = (X @ P1[:, :3].T + P1[:, 3])
    uv1 = uv1[:, :2] / uv1[:, 2:]
    x2 = X @ R2.T + t2
    uv2 = (x2 @ K.T)
    uv2 = uv2[:, :2] / uv2[:, 2:]

    ours = np.asarray(
        triangulate_dlt(
            jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2, jnp.float32),
            jnp.asarray(P1, jnp.float32), jnp.asarray(P2, jnp.float32),
        )
    )
    ref_h = cv2.triangulatePoints(P1, P2, uv1.T.astype(np.float64), uv2.T.astype(np.float64))
    ref = (ref_h[:3] / ref_h[3]).T
    np.testing.assert_allclose(ours, ref, atol=5e-2)
    np.testing.assert_allclose(ours, X, atol=5e-2)


def test_ba_zero_residual_at_gt(rng):
    X, R_cw, t_cw, obs, mask = _make_window(rng, noise_px=0.0)
    state = BAState(
        R=jnp.asarray(R_cw, jnp.float32), t=jnp.asarray(t_cw, jnp.float32),
        X=jnp.asarray(X, jnp.float32),
    )
    prob = BAProblem(
        obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        fx=FX, fy=FY, cx=CX, cy=CY,
    )
    r, _ = reprojection_residuals(state, prob)
    rn = np.linalg.norm(np.asarray(r), axis=-1)[np.asarray(mask)]
    assert rn.max() < 1e-2


def test_ba_converges_from_perturbed_state(rng):
    X, R_cw, t_cw, obs, mask = _make_window(rng, noise_px=0.3)
    # Perturb poses (except gauge pose 0) and landmarks.
    R_p = R_cw.copy()
    t_p = t_cw.copy()
    for k in range(1, len(R_cw)):
        R_p[k] = Rsp.from_rotvec(rng.normal(scale=0.01, size=3)).as_matrix() @ R_cw[k]
        t_p[k] = t_cw[k] + rng.normal(scale=0.05, size=3)
    X_p = X + rng.normal(scale=0.2, size=X.shape)

    state0 = BAState(
        R=jnp.asarray(R_p, jnp.float32), t=jnp.asarray(t_p, jnp.float32),
        X=jnp.asarray(X_p, jnp.float32),
    )
    prob = BAProblem(
        obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        fx=FX, fy=FY, cx=CX, cy=CY,
    )
    state, info = bundle_adjust(state0, prob, iters=10)
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])

    # Pose recovery: compare camera centers (R^T t gives -center).
    c_est = -np.einsum("wji,wj->wi", np.asarray(state.R), np.asarray(state.t))
    c_gt = -np.einsum("wji,wj->wi", R_cw, t_cw)
    err = np.linalg.norm(c_est - c_gt, axis=-1)
    assert err.max() < 0.02, err

    # Residual RMS should be near the injected noise level.
    r, _ = reprojection_residuals(state, prob)
    rn = np.linalg.norm(np.asarray(r), axis=-1)[np.asarray(mask)]
    assert np.sqrt((rn ** 2).mean()) < 1.0


def test_ba_robust_to_outliers(rng):
    X, R_cw, t_cw, obs, mask = _make_window(rng, noise_px=0.3, outlier_frac=0.05)
    R_p = R_cw.copy(); t_p = t_cw.copy()
    for k in range(1, len(R_cw)):
        t_p[k] = t_cw[k] + rng.normal(scale=0.03, size=3)
    X_p = X + rng.normal(scale=0.1, size=X.shape)
    state0 = BAState(
        R=jnp.asarray(R_p, jnp.float32), t=jnp.asarray(t_p, jnp.float32),
        X=jnp.asarray(X_p, jnp.float32),
    )
    prob = BAProblem(
        obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
        fx=FX, fy=FY, cx=CX, cy=CY,
    )
    state, info = bundle_adjust(state0, prob, iters=12, huber_delta=2.0)
    c_est = -np.einsum("wji,wj->wi", np.asarray(state.R), np.asarray(state.t))
    c_gt = -np.einsum("wji,wj->wi", R_cw, t_cw)
    err = np.linalg.norm(c_est - c_gt, axis=-1)
    # Huber keeps the solution close despite 5% gross outliers.
    assert err.max() < 0.05, err


def test_ba_jits_once_and_reruns(rng):
    # Two different windows, same shapes: second call must reuse the trace.
    X, R_cw, t_cw, obs, mask = _make_window(rng)
    state = BAState(
        R=jnp.asarray(R_cw, jnp.float32), t=jnp.asarray(t_cw, jnp.float32),
        X=jnp.asarray(X, jnp.float32),
    )
    prob = BAProblem(jnp.asarray(obs), jnp.asarray(mask), FX, FY, CX, CY)
    s1, _ = bundle_adjust(state, prob, iters=3)
    X2, R2, t2, obs2, mask2 = _make_window(rng)
    prob2 = BAProblem(jnp.asarray(obs2), jnp.asarray(mask2), FX, FY, CX, CY)
    state2 = BAState(
        R=jnp.asarray(R2, jnp.float32), t=jnp.asarray(t2, jnp.float32),
        X=jnp.asarray(X2, jnp.float32),
    )
    s2, _ = bundle_adjust(state2, prob2, iters=3)
    assert np.isfinite(np.asarray(s2.X)).all()
