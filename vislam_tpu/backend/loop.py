"""Loop-closure detection: global descriptors + geometric verification.

New capability (absent in the reference) supporting pose-graph loop
correction (BASELINE.json config #4). Place recognition is batched and
fixed-shape: each keyframe gets a global descriptor (the normalized mean of
its local descriptors — a tiny VLAD-0 analog); candidate pairs come from a
cosine-similarity matrix with a temporal-separation mask; candidates are
verified geometrically with the standard matcher + epipolar RANSAC.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.frontend.match import match_descriptors
from vislam_tpu.frontend.pose import ransac_translation


def global_descriptors(desc, kp_mask):
    """(W, K, D) local descriptors -> (W, D) normalized global descriptors."""
    w = kp_mask.astype(desc.dtype)[..., None]
    mean = jnp.sum(desc * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    return mean / jnp.maximum(
        jnp.linalg.norm(mean, axis=-1, keepdims=True), 1e-9
    )


class LoopCandidates(NamedTuple):
    idx_a: jnp.ndarray   # (C,) int32 earlier keyframe
    idx_b: jnp.ndarray   # (C,) int32 later keyframe
    sim: jnp.ndarray     # (C,) cosine similarity
    mask: jnp.ndarray    # (C,) bool


def detect_loop_candidates(
    gdesc, valid, min_separation: int = 5, sim_thresh: float = 0.9,
    max_candidates: int = 8,
) -> LoopCandidates:
    """Top-C most similar non-adjacent keyframe pairs (fixed capacity)."""
    W = gdesc.shape[0]
    S = gdesc @ gdesc.T  # (W, W) cosine similarity
    ii = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    ok = (jj - ii >= min_separation) & valid[:, None] & valid[None, :]
    S = jnp.where(ok, S, -1.0)
    flat = S.reshape(-1)
    top_sim, top_idx = jax.lax.top_k(flat, max_candidates)
    idx_a = (top_idx // W).astype(jnp.int32)
    idx_b = (top_idx % W).astype(jnp.int32)
    return LoopCandidates(
        idx_a=idx_a, idx_b=idx_b, sim=top_sim,
        mask=top_sim > sim_thresh,
    )


def verify_loop(
    desc_a, mask_a, uv_a, desc_b, mask_b, uv_b,
    fx, fy, cx, cy, key,
    min_inliers: int = 24, ratio: float = 0.8, ransac_thresh: float = 0.02,
):
    """Geometric verification of one candidate pair.

    Rotation is unknown for loops (unlike odometry), so the epipolar solve
    runs with identity rotation compensation — valid for loop closures
    revisiting a place with similar heading; heading-variant loops are
    accepted only if inliers still clear the bar (conservative).

    Returns (accepted: bool, R_ji (identity), t_dir, num_inliers).
    """
    m = match_descriptors(desc_a, mask_a, desc_b, mask_b, ratio=ratio)
    rays = lambda uv: _rays(uv, fx, fy, cx, cy)
    ra = rays(uv_a)
    rb = rays(jnp.take(uv_b, m.idx_b, axis=0))
    est = ransac_translation(ra, rb, jnp.eye(3), m.mask, key,
                             num_hyps=256, thresh=ransac_thresh)
    accepted = est.num_inliers >= min_inliers
    return accepted, jnp.eye(3), est.t_dir, est.num_inliers


def _rays(uv, fx, fy, cx, cy):
    x = (uv[:, 0] - cx) / fx
    y = (uv[:, 1] - cy) / fy
    r = jnp.stack([x, y, jnp.ones_like(x)], -1)
    return r / jnp.linalg.norm(r, axis=-1, keepdims=True)
