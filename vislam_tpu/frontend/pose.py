"""Two-view relative pose: rotation-compensated epipolar translation solve.

Role of the reference's frame-to-frame solver chain
(/root/reference/src/VISystem.cpp): Disparity (:422-471, rotation-compensated
mean pixel displacement), FilterKeypoints (:542-610, epipolar-normal
degeneracy filter), and F2FRansac (:612-769) — a 1000-iteration scalar RANSAC
over cross products of epipolar normals that recovers the translation
*direction* (monocular scale comes from GT or, in our VI mode, from IMU
preintegration).

TPU redesign: hypothesis generation and scoring are one batched computation —
H hypotheses x M matches scored with a single (H,3)x(3,M) matmul — replacing
the reference's sequential 1000xN loop. The refinement step solves the
smallest-eigenvector problem of the 3x3 inlier scatter matrix in closed form.

Geometry: for matched unit-ish rays x1 (frame i) and x2 (frame j) with
relative rotation R (taking frame-i vectors to frame-j), the epipolar
constraint is x2 . (t x (R x1)) = 0, i.e. every normal n = x2 x (R x1) is
orthogonal to the translation direction t (up to noise).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TranslationEstimate(NamedTuple):
    t_dir: jnp.ndarray        # (3,) unit translation direction, frame-j coords
    inlier_mask: jnp.ndarray  # (M,) bool
    num_inliers: jnp.ndarray  # () int32
    score: jnp.ndarray        # () float32 (inlier fraction among valid)


def epipolar_normals(rays_i, rays_j, R_ji):
    """n = x_j x (R_ji x_i), normalized. rays: (M, 3)."""
    rot = rays_i @ R_ji.T
    n = jnp.cross(rays_j, rot)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return n / jnp.maximum(norm, 1e-12), norm[..., 0]


def epipolar_inlier_mask(rays_i, rays_j, R_ji, t_dir, thresh: float):
    """|n . t| < thresh on normalized epipolar normals."""
    n, _ = epipolar_normals(rays_i, rays_j, R_ji)
    return jnp.abs(n @ t_dir) < thresh


def rotation_compensated_disparity(uv_i, uv_j, mask, R_ji, fx, fy, cx, cy):
    """Mean pixel displacement after removing the rotation-predicted motion.

    Role of VISystem::Disparity (/root/reference/src/VISystem.cpp:422-471):
    warp frame-i pixels by the infinite-depth homography K R K^-1 and measure
    the residual displacement to their matches — the translation-induced
    parallax that drives the keyframe policy.
    """
    x = (uv_i[:, 0] - cx) / fx
    y = (uv_i[:, 1] - cy) / fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], -1)
    warped = rays @ R_ji.T
    z = jnp.maximum(jnp.abs(warped[:, 2]), 1e-9) * jnp.sign(
        jnp.where(warped[:, 2] == 0, 1.0, warped[:, 2])
    )
    u_pred = warped[:, 0] / z * fx + cx
    v_pred = warped[:, 1] / z * fy + cy
    d = jnp.sqrt((uv_j[:, 0] - u_pred) ** 2 + (uv_j[:, 1] - v_pred) ** 2)
    w = mask.astype(d.dtype)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1.0)


def _degeneracy_weights(norm, mask):
    """Down-weight near-degenerate normals (parallel rays => |n| ~ 0).

    Role of FilterKeypoints' threshold test
    (/root/reference/src/VISystem.cpp:542-610).
    """
    return mask.astype(jnp.float32) * (norm > 1e-5).astype(jnp.float32)


def ransac_translation(
    rays_i,
    rays_j,
    R_ji,
    mask,
    key,
    num_hyps: int = 512,
    thresh: float = 0.02,
    uv_i=None,
    dispersion_pow: float = 0.0,
) -> TranslationEstimate:
    """Vectorized RANSAC for the translation direction.

    rays_*: (M, 3) camera rays of the matches; R_ji relative rotation
    (from IMU, like the reference); mask: (M,) valid matches; key: PRNG key.

    dispersion_pow > 0 (requires uv_i, the (M, 2) pixel coords of the
    frame-i keypoints): hypothesis score = inliers x (spatial dispersion of
    the inlier set)^pow. Independently MOVING OBJECTS (occluders) are
    spatially compact; a compromise mode that recruits their epipolar-
    coincident matches tilts the solved direction (measured: 4.7 deg median
    error vs a 2.4 deg static-only oracle on the occlusion regime) while
    concentrating its inliers — dispersion weighting (pow=2) restores the
    spread-out static mode (2.1 deg, BETTER than the oracle) at negligible
    cost elsewhere (round-4 sweep across all adversarial regimes). Egomotion
    outlier handling the reference lacks entirely (its RANSAC votes by
    count alone, /root/reference/src/VISystem.cpp:709-751).
    """
    M = rays_i.shape[0]
    n, n_norm = epipolar_normals(rays_i, rays_j, R_ji)
    w = _degeneracy_weights(n_norm, mask)

    # --- Hypotheses: t = n_a x n_b for random valid pairs (a, b).
    ka, kb = jax.random.split(key)
    # Sample indices proportional to validity (invalid rows get ~0 probability).
    logits = jnp.log(w + 1e-9)
    idx_a = jax.random.categorical(ka, logits, shape=(num_hyps,))
    idx_b = jax.random.categorical(kb, logits, shape=(num_hyps,))
    t_hyp = jnp.cross(n[idx_a], n[idx_b])  # (H, 3)
    t_norm = jnp.linalg.norm(t_hyp, axis=-1, keepdims=True)
    t_hyp = t_hyp / jnp.maximum(t_norm, 1e-12)
    hyp_ok = (t_norm[:, 0] > 1e-6) & (idx_a != idx_b)

    # --- Score all hypotheses at once: (H, 3) @ (3, M) on the MXU.
    resid = jnp.abs(t_hyp @ n.T)  # (H, M)
    inl_tab = (resid < thresh) * w[None, :]        # (H, M)
    votes = jnp.sum(inl_tab, axis=1)
    if dispersion_pow > 0.0 and uv_i is not None:
        # Per-hypothesis inlier spatial std (normalized coords), two more
        # (H, M) @ (M, 2) matmuls on the MXU.
        uvn = uv_i / jnp.asarray(
            [jnp.max(uv_i[:, 0]) + 1.0, jnp.max(uv_i[:, 1]) + 1.0])
        nv = jnp.maximum(votes, 1.0)[:, None]
        mu = (inl_tab @ uvn) / nv
        second = (inl_tab @ (uvn * uvn)) / nv
        disp = jnp.sqrt(jnp.maximum(jnp.sum(second - mu * mu, -1), 1e-12))
        score = votes * disp ** dispersion_pow
    else:
        score = votes
    score = jnp.where(hyp_ok, score, -1.0)
    best = jnp.argmax(score)
    t_best = t_hyp[best]

    # --- Refine: smallest eigenvector of the inlier scatter sum n n^T.
    inl = (jnp.abs(n @ t_best) < thresh) & (w > 0)
    wi = inl.astype(jnp.float32)
    S = jnp.einsum("m,mi,mj->ij", wi, n, n, preferred_element_type=jnp.float32)
    # Guard: eigh of a well-formed symmetric 3x3 (add tiny ridge for stability).
    evals, evecs = jnp.linalg.eigh(S + 1e-9 * jnp.eye(3))
    t_ref = evecs[:, 0]
    # Keep orientation consistent with the RANSAC winner.
    t_ref = t_ref * jnp.sign(jnp.sum(t_ref * t_best) + 1e-12)

    inl_ref = (jnp.abs(n @ t_ref) < thresh) & (w > 0)
    num = jnp.sum(inl_ref)
    valid = jnp.maximum(jnp.sum(w), 1.0)
    return TranslationEstimate(
        t_dir=t_ref,
        inlier_mask=inl_ref,
        num_inliers=num.astype(jnp.int32),
        score=num.astype(jnp.float32) / valid,
    )


def resolve_direction_sign(rays_i, rays_j, R_ji, t_dir, inlier_mask):
    """Pick the sign of t so triangulated depths are positive (cheirality).

    The reference resolves sign against GT (/root/reference/src/VISystem.cpp:
    639-642); this is the GT-free resolution: midpoint triangulation depth
    majority vote over inliers.
    """
    # Two-ray midpoint: depth of x_j along its ray for candidate t and -t.
    rot = rays_i @ R_ji.T  # frame-j direction of ray i
    # Solve [rot, -x_j] [di; dj] = -t in least squares per match (2x2 normal eq).
    a = jnp.sum(rot * rot, -1)
    b = -jnp.sum(rot * rays_j, -1)
    c = jnp.sum(rays_j * rays_j, -1)
    rhs1 = -jnp.sum(rot * t_dir[None, :], -1)
    rhs2 = jnp.sum(rays_j * t_dir[None, :], -1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    dj = (a * rhs2 - b * rhs1) / det
    w = inlier_mask.astype(jnp.float32)
    pos = jnp.sum((dj > 0) * w)
    neg = jnp.sum((dj < 0) * w)
    return jnp.where(pos >= neg, t_dir, -t_dir)
