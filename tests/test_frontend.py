"""Frontend tests: detection recall on synthetic scenes, descriptor matching
across frames, match-filter semantics vs a numpy brute-force oracle, and the
rotation-compensated RANSAC translation solver on exact geometry."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.frontend import (
    Matches,
    extract_features,
    match_descriptors,
    ransac_translation,
    rotation_compensated_disparity,
)
from vislam_tpu.frontend.pose import resolve_direction_sign, epipolar_normals
from vislam_tpu.utils.config import FrontendConfig

CFG = FrontendConfig()


def _project(lm, pos, R_wb, calib):
    Xc = (lm - pos) @ R_wb
    z = Xc[:, 2]
    u = calib.fx * Xc[:, 0] / z + calib.cx
    v = calib.fy * Xc[:, 1] / z + calib.cy
    return np.stack([u, v], -1), z


def test_detection_recall_on_synthetic():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=2, n_landmarks=250, seed=0))
    calib = seq["calib"]
    feats = extract_features(jnp.asarray(seq["images"][0], jnp.float32), CFG)
    uv = np.asarray(feats.uv)[np.asarray(feats.mask)]
    # Ground-truth landmark projections in frame 0.
    R0 = Rsp.from_quat(np.roll(seq["gt_quat"][0], -1)).as_matrix()
    uv_gt, z = _project(seq["landmarks"], seq["gt_pos"][0], R0, calib)
    vis = (z > 0.5) & (uv_gt[:, 0] > 12) & (uv_gt[:, 0] < calib.width - 12) \
        & (uv_gt[:, 1] > 12) & (uv_gt[:, 1] < calib.height - 12)
    uv_gt = uv_gt[vis]
    # Each visible landmark should have a detection within its texture patch
    # (the detector locks onto the strongest corner of the patch, not its
    # center, so the radius is patch-half + localization slack).
    d = np.linalg.norm(uv_gt[:, None, :] - uv[None, :, :], axis=-1).min(axis=1)
    recall = (d < 5.0).mean()
    assert recall > 0.75, f"detection recall {recall:.2f}"


def test_match_semantics_vs_numpy_oracle(rng):
    K, D = 64, 32
    a = rng.normal(size=(K, D)).astype(np.float32)
    b = rng.normal(size=(K, D)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    mask_a = np.ones(K, bool); mask_a[-5:] = False
    mask_b = np.ones(K, bool); mask_b[:3] = False

    m = match_descriptors(
        jnp.asarray(a), jnp.asarray(mask_a), jnp.asarray(b), jnp.asarray(mask_b),
        ratio=0.95, mutual=True,
    )

    # Oracle: brute-force with ratio + mutual.
    Dm = np.linalg.norm(a[:, None] - b[None, :], axis=-1)
    Dm[~mask_a] = np.inf
    Dm[:, ~mask_b] = np.inf
    expect = np.full(K, -1)
    for i in range(K):
        if not mask_a[i]:
            continue
        order = np.argsort(Dm[i])
        j1, j2 = order[0], order[1]
        if not np.isfinite(Dm[i, j1]):
            continue
        if Dm[i, j1] >= 0.95 * Dm[i, j2]:
            continue
        if np.argmin(Dm[:, j1]) != i:
            continue
        expect[i] = j1

    got = np.where(np.asarray(m.mask), np.asarray(m.idx_b), -1)
    np.testing.assert_array_equal(got, expect)


def test_match_grid_dedup(rng):
    # Two A-keypoints in the same cell must yield a single surviving match.
    K, D = 8, 16
    base = rng.normal(size=(K, D)).astype(np.float32)
    a = base / np.linalg.norm(base, axis=-1, keepdims=True)
    b = a.copy()
    uv_a = np.array([[10, 10], [12, 12], [200, 200], [210, 210],
                     [400, 30], [50, 400], [420, 420], [60, 60]], np.float32)
    m = match_descriptors(
        jnp.asarray(a), jnp.ones(K, bool), jnp.asarray(b), jnp.ones(K, bool),
        uv_a=jnp.asarray(uv_a), ratio=2.0, mutual=True,
        cell_rows=2, cell_cols=2, image_size=(480, 480),
    )
    mask = np.asarray(m.mask)
    # cells: (10,10),(12,12),(60,60) share top-left; (200,200),(210,210) also
    # top-left (<240). Only one survivor per occupied cell.
    cells = (uv_a[:, 1] // 240).astype(int) * 2 + (uv_a[:, 0] // 240).astype(int)
    for c in np.unique(cells):
        assert mask[cells == c].sum() == 1, (c, mask)


def test_feature_matching_across_frames():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=3, n_landmarks=250, seed=1))
    fa = extract_features(jnp.asarray(seq["images"][0], jnp.float32), CFG)
    fb = extract_features(jnp.asarray(seq["images"][1], jnp.float32), CFG)
    m = match_descriptors(
        fa.desc, fa.mask, fb.desc, fb.mask, ratio=CFG.ratio_thresh, mutual=True
    )
    n_matches = int(np.asarray(m.mask).sum())
    assert n_matches > 60, n_matches

    # Verify matches geometrically: matched uv displacement should be small
    # (consecutive frames, gentle motion) for the vast majority.
    uv_a = np.asarray(fa.uv)
    uv_b = np.asarray(fb.uv)[np.asarray(m.idx_b)]
    d = np.linalg.norm(uv_a - uv_b, axis=-1)[np.asarray(m.mask)]
    assert np.median(d) < 30.0
    assert (d < 50).mean() > 0.85  # residual outliers are RANSAC's job


def test_guided_matching_gate(rng):
    K, D = 32, 16
    a = rng.normal(size=(K, D)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b = a.copy()
    uv_pred = rng.uniform(0, 400, (K, 2)).astype(np.float32)
    # Within the gate: all matches survive.
    m_in = match_descriptors(
        jnp.asarray(a), jnp.ones(K, bool), jnp.asarray(b), jnp.ones(K, bool),
        ratio=2.0, uv_pred=jnp.asarray(uv_pred),
        uv_b=jnp.asarray(uv_pred + 3.0), gate_radius=10.0,
    )
    assert int(np.asarray(m_in.mask).sum()) == K
    # True counterparts pushed outside the gate: every SURVIVING match must
    # still satisfy the gate (only accidental in-gate pairs may remain).
    uv_b_far = uv_pred + 50.0
    m_out = match_descriptors(
        jnp.asarray(a), jnp.ones(K, bool), jnp.asarray(b), jnp.ones(K, bool),
        ratio=2.0, uv_pred=jnp.asarray(uv_pred),
        uv_b=jnp.asarray(uv_b_far), gate_radius=10.0,
    )
    mask = np.asarray(m_out.mask)
    # The identical-descriptor diagonal (distance ~70 px) must be gated out.
    idx = np.asarray(m_out.idx_b)
    assert not (mask & (idx == np.arange(K))).any()
    d = np.linalg.norm(uv_pred - uv_b_far[idx], axis=-1)
    assert np.all(d[mask] <= 10.0 + 1e-3)


def test_multilevel_extraction():
    import dataclasses

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=2, n_landmarks=250, seed=1))
    cfg2 = dataclasses.replace(CFG, levels_used=2)
    f = extract_features(jnp.asarray(seq["images"][0], jnp.float32), cfg2)
    # Round-3 budget semantics: level 0 keeps the full per-cell budget,
    # coarser levels add kp_per_cell_coarse extra capacity.
    cells = cfg2.grid_rows * cfg2.grid_cols
    assert f.uv.shape[0] == cfg2.max_keypoints == cells * (
        cfg2.kp_per_cell + cfg2.kp_per_cell_coarse)
    lv = np.asarray(f.level)
    m = np.asarray(f.mask)
    assert (lv[m] == 0).any() and (lv[m] == 1).any()
    # Level-1 keypoints live in level-0 pixel coordinates (scaled up).
    assert np.asarray(f.uv)[m].max() > 100


def test_disparity_pure_rotation_is_zero():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=2, n_landmarks=100, seed=2))
    calib = seq["calib"]
    # Build exact correspondences under a pure rotation.
    R = Rsp.from_euler("ZYX", [5.0, 3.0, -2.0], degrees=True).as_matrix()
    lm = seq["landmarks"]
    uv_i, _ = _project(lm, np.zeros(3), np.eye(3), calib)
    uv_j, _ = _project(lm, np.zeros(3), R, calib)  # camera rotated by R
    mask = np.all(np.abs(uv_i - [calib.cx, calib.cy]) < 350, axis=-1)
    # R_ji: takes frame-i camera vectors to frame-j: R_ji = R_j^T R_i = R^T.
    disp = rotation_compensated_disparity(
        jnp.asarray(uv_i, jnp.float32), jnp.asarray(uv_j, jnp.float32),
        jnp.asarray(mask), jnp.asarray(R.T, jnp.float32),
        calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert float(disp) < 0.1

    # With translation, disparity must be clearly positive.
    uv_j2, _ = _project(lm, np.array([0.4, 0.0, 0.0]), R, calib)
    disp2 = rotation_compensated_disparity(
        jnp.asarray(uv_i, jnp.float32), jnp.asarray(uv_j2, jnp.float32),
        jnp.asarray(mask), jnp.asarray(R.T, jnp.float32),
        calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert float(disp2) > 5.0


def test_ransac_translation_exact_geometry(rng):
    # Known relative pose; rays constructed exactly; direction must be found.
    M = 256
    lm = np.stack(
        [rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(4, 10, M)], -1
    )
    R_rel = Rsp.from_rotvec([0.03, -0.05, 0.02]).as_matrix()  # j relative to i
    t_rel = np.array([0.3, -0.1, 0.05])  # position of j origin in i coords
    # Frame i at identity; frame j: X_j = R_rel^T (X_i - t_rel).
    X_i = lm
    X_j = (lm - t_rel) @ R_rel
    rays_i = X_i / np.linalg.norm(X_i, axis=-1, keepdims=True)
    rays_j = X_j / np.linalg.norm(X_j, axis=-1, keepdims=True)
    # R_ji takes i-frame vectors to j-frame: R_rel^T. t in j coords: -R_rel^T t_rel.
    R_ji = R_rel.T
    t_j = -R_rel.T @ t_rel
    t_j_dir = t_j / np.linalg.norm(t_j)

    # Add 15% outliers.
    n_out = M // 7
    rays_j_noisy = rays_j.copy()
    rays_j_noisy[:n_out] = rng.normal(size=(n_out, 3))
    rays_j_noisy[:n_out] /= np.linalg.norm(rays_j_noisy[:n_out], axis=-1, keepdims=True)
    rays_j_noisy[:n_out, 2] = np.abs(rays_j_noisy[:n_out, 2])

    est = ransac_translation(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j_noisy, jnp.float32),
        jnp.asarray(R_ji, jnp.float32), jnp.ones(M, bool),
        jax.random.PRNGKey(0), num_hyps=512, thresh=0.01,
    )
    t_est = np.asarray(est.t_dir)
    t_est = resolve_direction_sign(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j_noisy, jnp.float32),
        jnp.asarray(R_ji, jnp.float32), jnp.asarray(t_est), est.inlier_mask,
    )
    t_est = np.asarray(t_est)
    ang = np.degrees(np.arccos(np.clip(np.dot(t_est, t_j_dir), -1, 1)))
    assert ang < 2.0, f"direction error {ang:.2f} deg"
    assert int(est.num_inliers) > 0.7 * (M - n_out)


def test_epipolar_normals_orthogonal_to_t(rng):
    M = 64
    lm = np.stack(
        [rng.uniform(-4, 4, M), rng.uniform(-3, 3, M), rng.uniform(4, 10, M)], -1
    )
    R_rel = Rsp.from_rotvec([0.1, 0.05, -0.04]).as_matrix()
    t_rel = np.array([0.2, 0.1, -0.05])
    X_j = (lm - t_rel) @ R_rel
    rays_i = lm / np.linalg.norm(lm, axis=-1, keepdims=True)
    rays_j = X_j / np.linalg.norm(X_j, axis=-1, keepdims=True)
    n, _ = epipolar_normals(
        jnp.asarray(rays_i, jnp.float32), jnp.asarray(rays_j, jnp.float32),
        jnp.asarray(R_rel.T, jnp.float32),
    )
    t_j = -R_rel.T @ t_rel
    t_j /= np.linalg.norm(t_j)
    dots = np.abs(np.asarray(n) @ t_j)
    assert np.percentile(dots, 95) < 1e-4


def test_patch_descriptor_matches_fullimage_oracle(rng):
    """The round-4 patch-based descriptor path (dynamic-slice patches +
    in-patch shift convs + separable one-hot bilinear sampling on the MXU)
    must reproduce the full-image conv+gather formulation exactly for
    interior keypoints — the rewrite is a runtime optimization, not a
    semantics change."""
    from vislam_tpu.frontend.descriptor import (
        DESC_DIM, _NBINS, _OFFS, _WSP, _bilinear_gather, describe_keypoints)
    from vislam_tpu.frontend.pyramid import gaussian_blur, scharr_gradients

    H, W, K = 240, 320, 48
    img = jnp.asarray(rng.uniform(0, 255, (H, W)).astype(np.float32))
    uv = jnp.asarray(np.stack([
        rng.uniform(30, W - 30, K), rng.uniform(30, H - 30, K)], -1
    ).astype(np.float32))
    angle = jnp.asarray(rng.uniform(-np.pi, np.pi, K).astype(np.float32))

    def oracle(img, uv, angle, smooth_sigma=0.6):
        img_s = gaussian_blur(img, smooth_sigma, radius=2)
        gx, gy = scharr_gradients(img_s)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        offs = jnp.asarray(_OFFS)
        rx = ca[:, None] * offs[None, :, 0] - sa[:, None] * offs[None, :, 1]
        ry = sa[:, None] * offs[None, :, 0] + ca[:, None] * offs[None, :, 1]
        coords = uv[:, None, :] + jnp.stack([rx, ry], -1)
        gxs = _bilinear_gather(gx, coords)
        gys = _bilinear_gather(gy, coords)
        gxr = ca[:, None] * gxs + sa[:, None] * gys
        gyr = -sa[:, None] * gxs + ca[:, None] * gys
        mag = jnp.sqrt(gxr * gxr + gyr * gyr + 1e-12)
        ori = jnp.arctan2(gyr, gxr)
        obin = (ori / (2 * jnp.pi) + 0.5) * _NBINS - 0.5
        o0 = jnp.floor(obin)
        do = obin - o0
        o0i = jnp.mod(o0.astype(jnp.int32), _NBINS)
        o1i = jnp.mod(o0i + 1, _NBINS)
        eye = jnp.eye(_NBINS, dtype=jnp.float32)
        O = (1.0 - do)[..., None] * eye[o0i] + do[..., None] * eye[o1i]
        M = mag[..., None] * O
        d = jnp.einsum("ksb,sc->kcb", M, jnp.asarray(_WSP),
                       preferred_element_type=jnp.float32).reshape(K, DESC_DIM)
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
        d = jnp.minimum(d, 0.2)
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)

    d_new = np.asarray(describe_keypoints(img, uv, angle))
    d_old = np.asarray(oracle(img, uv, angle))
    cos = (d_new * d_old).sum(-1)
    assert np.abs(d_new - d_old).max() < 1e-4
    assert cos.min() > 0.9999
