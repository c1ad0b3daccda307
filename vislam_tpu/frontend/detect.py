"""Batched corner detection with fixed-capacity grid top-k.

Role of the reference's detector factory + detectAndCompute
(/root/reference/src/Camera.cpp:94-138,84-92 — SURF/ORB/KAZE/AKAZE/SIFT) and
its spatial grid filter (/root/reference/src/Matcher.cpp:171-284), redesigned
TPU-first: a Shi-Tomasi (min-eigenvalue) corner response — pure convs and
elementwise ops that XLA fuses — followed by 3x3 NMS and a *static-shape*
top-k-per-grid-cell selection that bounds keypoint count by construction
(the reference bounds matches per cell after the fact; we bound keypoints up
front, which is the fixed-shape TPU idiom).

Scale coverage comes from running detection per pyramid level (the caller
concatenates), matching the reference's multi-scale detectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vislam_tpu.frontend.pyramid import scharr_gradients, gaussian_blur


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (padded; `mask` marks valid rows)."""

    uv: jnp.ndarray       # (K, 2) float32 pixel coords (level-0 frame)
    score: jnp.ndarray    # (K,) float32 corner response
    level: jnp.ndarray    # (K,) int32 pyramid level
    angle: jnp.ndarray    # (K,) float32 orientation (radians)
    mask: jnp.ndarray     # (K,) bool


def harris_response(img, k: float = 0.04, sigma: float = 1.5):
    """Shi-Tomasi min-eigenvalue corner response (k kept for API parity).

    response = (a+c)/2 - sqrt(((a-c)/2)^2 + b^2) with [a b; b c] the blurred
    structure tensor. Min-eig is more stable than the Harris det-k*tr^2 form.
    """
    gx, gy = scharr_gradients(img)
    a = gaussian_blur(gx * gx, sigma)
    b = gaussian_blur(gx * gy, sigma)
    c = gaussian_blur(gy * gy, sigma)
    half_tr = 0.5 * (a + c)
    half_diff = 0.5 * (a - c)
    return half_tr - jnp.sqrt(half_diff * half_diff + b * b + 1e-12)


def harris_cornerness(img, k: float = 0.04, sigma: float = 1.5):
    """Classic Harris det - k*tr^2 cornerness (the reference detector family's
    corner measure underlying its grid candidate selection)."""
    gx, gy = scharr_gradients(img)
    a = gaussian_blur(gx * gx, sigma)
    b = gaussian_blur(gx * gy, sigma)
    c = gaussian_blur(gy * gy, sigma)
    det = a * c - b * b
    tr = a + c
    return det - k * tr * tr


def dog_response(img, sigma1: float = 1.0, sigma2: float = 1.6):
    """Difference-of-Gaussians blob response (|DoG|) — the SIFT/KAZE-family
    scale-space extremum measure (role of the reference's SIFT/KAZE options,
    /root/reference/src/Camera.cpp:94-138). Pure convs; XLA fuses."""
    return jnp.abs(gaussian_blur(img, sigma1, radius=3)
                   - gaussian_blur(img, sigma2, radius=4))


def hessian_response(img, sigma: float = 1.5):
    """Determinant-of-Hessian blob response — the SURF-family interest
    measure (role of the reference's default SURF detector,
    /root/reference/calibration/calibrationEUROC.xml:57)."""
    sm = gaussian_blur(img, sigma, radius=3)
    gx, gy = scharr_gradients(sm)
    gxx, gxy = scharr_gradients(gx)
    _, gyy = scharr_gradients(gy)
    return gxx * gyy - gxy * gxy


# Bresenham circle of radius 3 — the FAST-16 sampling ring, as (dv, du).
_FAST_RING = np.array(
    [(-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
     (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1)],
    dtype=np.int32,
)


def fast_response(img, arc: int = 9):
    """FAST-16 segment-test score — the ORB-family corner measure (role of
    the reference's ORB option, /root/reference/src/Camera.cpp:114-117).

    TPU formulation: the 16 ring samples are 16 static `jnp.roll`s of the
    image (cheap lane shifts); the contiguous-arc test is a circular
    min-window over the 16-axis. score = max over arc starts of
    min over the `arc` contiguous samples of (p - c) [bright] or (c - p)
    [dark] — positive iff a full contiguous arc is strictly brighter/darker
    than the center, with magnitude = the weakest contrast in the best arc.
    """
    ring = jnp.stack(
        [jnp.roll(img, (-int(dv), -int(du)), axis=(0, 1)) for dv, du in _FAST_RING]
    )  # (16, H, W); ring[i][v,u] = img[v+dv_i, u+du_i]
    bright = ring - img[None]
    dark = -bright

    def arc_score(d):
        # min over `arc` contiguous ring positions, circularly, then max
        # over the 16 start positions.
        m = d
        for s in range(1, arc):
            m = jnp.minimum(m, jnp.roll(d, -s, axis=0))
        return jnp.max(m, axis=0)

    return jnp.maximum(arc_score(bright), arc_score(dark))


# Detector factory: response-function registry (role of the reference's
# detector factory switch, /root/reference/src/Camera.cpp:94-138 —
# KAZE/AKAZE/ORB/SIFT/SURF). Every response plugs into the same
# NMS + grid-top-k selection, so swapping detectors never changes shapes.
DETECTOR_RESPONSES = {
    "shi_tomasi": harris_response,       # min-eigenvalue (GFTT)
    "harris": harris_cornerness,         # det - k tr^2
    "dog": dog_response,                 # SIFT/KAZE-family blobs
    "hessian": hessian_response,         # SURF-family blobs
    "fast": fast_response,               # ORB-family segment test
}


def _nms(resp, radius: int = 1):
    """Keep only local maxima over a (2r+1)^2 window."""
    size = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        resp, -jnp.inf, jax.lax.max, (size, size), (1, 1), "SAME"
    )
    return jnp.where(resp >= pooled, resp, -jnp.inf)


def _grid_topk(resp, grid_rows: int, grid_cols: int, k_per_cell: int, border: int):
    """Top-k responses per grid cell -> (K, 2) uv + (K,) score, K = cells*k."""
    H, W = resp.shape
    # Suppress borders (descriptor support must stay inside the image).
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    interior = (
        (row_idx >= border) & (row_idx < H - border)
        & (col_idx >= border) & (col_idx < W - border)
    )
    resp = jnp.where(interior, resp, -jnp.inf)

    ch = H // grid_rows
    cw = W // grid_cols
    resp_c = resp[: ch * grid_rows, : cw * grid_cols]
    cells = resp_c.reshape(grid_rows, ch, grid_cols, cw)
    cells = cells.transpose(0, 2, 1, 3).reshape(grid_rows * grid_cols, ch * cw)

    score, flat_idx = jax.lax.top_k(cells, k_per_cell)  # (cells, k)
    cell_ids = jax.lax.broadcasted_iota(jnp.int32, score.shape, 0)
    cell_r = cell_ids // grid_cols
    cell_c = cell_ids % grid_cols
    in_r = flat_idx // cw
    in_c = flat_idx % cw
    v = (cell_r * ch + in_r).astype(jnp.float32)
    u = (cell_c * cw + in_c).astype(jnp.float32)
    uv = jnp.stack([u.reshape(-1), v.reshape(-1)], axis=-1)
    return uv, score.reshape(-1)


def _subpixel_refine(resp, uv):
    """Quadratic 1D refinement per axis on the response surface (+-0.5 px)."""
    u = uv[:, 0].astype(jnp.int32)
    v = uv[:, 1].astype(jnp.int32)
    H, W = resp.shape
    u = jnp.clip(u, 1, W - 2)
    v = jnp.clip(v, 1, H - 2)

    def grab(dv, du):
        return resp[v + dv, u + du]

    c = grab(0, 0)
    dx = 0.5 * (grab(0, 1) - grab(0, -1))
    dy = 0.5 * (grab(1, 0) - grab(-1, 0))
    dxx = grab(0, 1) + grab(0, -1) - 2 * c
    dyy = grab(1, 0) + grab(-1, 0) - 2 * c
    off_u = jnp.where(jnp.abs(dxx) > 1e-9, -dx / dxx, 0.0)
    off_v = jnp.where(jnp.abs(dyy) > 1e-9, -dy / dyy, 0.0)
    off_u = jnp.clip(off_u, -0.5, 0.5)
    off_v = jnp.clip(off_v, -0.5, 0.5)
    return uv + jnp.stack([off_u, off_v], axis=-1)


def _orientations(img, uv, sigma: float = 2.5):
    """Dominant gradient orientation at each keypoint (blurred gradients).

    Round-4 TPU path: patch-space blur+Scharr (shift-adds on (K, 16, 16))
    instead of two full-image convolution chains + point gathers — the
    full-image formulation measured 1.1 ms/frame fetch-forced (single-
    channel convs are pathologically slow on this runtime)."""
    from vislam_tpu.frontend.descriptor import (
        _shift_conv_patches, extract_patches)

    P = 16
    r = 3
    patches, iu0, iv0 = extract_patches(img.astype(jnp.float32), uv, P)
    x = np.arange(-r, r + 1, dtype=np.float32)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    sm = _shift_conv_patches(_shift_conv_patches(patches, g, 1), g, 2)
    sx = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
    dx = (-1.0, 0.0, 1.0)
    gx = _shift_conv_patches(_shift_conv_patches(sm, sx, 1), dx, 2)
    gy = _shift_conv_patches(_shift_conv_patches(sm, sx, 2), dx, 1)
    # Center pixel of each patch = the keypoint pixel (clipped at borders).
    cu = jnp.clip(uv[:, 0].astype(jnp.int32), 0, img.shape[1] - 1) - iu0
    cv = jnp.clip(uv[:, 1].astype(jnp.int32), 0, img.shape[0] - 1) - iv0
    K_ = uv.shape[0]
    flat = jnp.arange(K_) * P * P + cv * P + cu
    gxc = jnp.take(gx.reshape(-1), flat)
    gyc = jnp.take(gy.reshape(-1), flat)
    return jnp.arctan2(gyc.astype(jnp.float32), gxc.astype(jnp.float32))


def detect_keypoints(
    pyramid,
    grid_rows: int = 8,
    grid_cols: int = 8,
    kp_per_cell: int = 8,
    nms_radius: int = 2,
    min_score_rel: float = 1e-3,
    border: int = 12,
    levels_used: int = 1,
    detector: str = "shi_tomasi",
    use_pallas: bool = False,
) -> Keypoints:
    """Detect fixed-capacity keypoints over `levels_used` pyramid levels.

    kp_per_cell may be an int (same budget every level) or a sequence of
    per-level budgets (round-3 multi-scale: full budget at level 0, smaller
    extra capacity at coarser levels). Returns Keypoints with
    K = grid_rows * grid_cols * sum(per-level budgets) rows; invalid rows
    (below the relative score floor) are masked out. Coordinates are
    reported in level-0 pixels.

    use_pallas (shi_tomasi only) swaps the response+NMS stage for the fused
    VMEM-resident kernel (ops/harris_kernel.py); selection stays shared.
    """
    response_fn = DETECTOR_RESPONSES[detector]
    if isinstance(kp_per_cell, int):
        kp_by_level = (kp_per_cell,) * levels_used
    else:
        kp_by_level = tuple(kp_per_cell)
    all_uv, all_score, all_level, all_angle = [], [], [], []
    for lvl in range(levels_used):
        img = pyramid[lvl]
        # The fused kernel hardcodes 5x5 (radius-2) NMS; a config with a
        # different nms_radius must not silently get different suppression
        # on the TPU path than on XLA/CPU (advisor, round 4) — fall back.
        if use_pallas and nms_radius == 2 and jax.default_backend() == "tpu":
            # Fused VMEM response+NMS kernel, ALL detector families
            # (round 4): the XLA conv chains cost 5-7 ms/frame on this
            # runtime regardless of family.
            from vislam_tpu.ops.harris_kernel import harris_nms_auto

            resp, full_resp = harris_nms_auto(img.astype(jnp.float32),
                                              detector=detector)
        else:
            # Response in the pyramid's dtype (bf16 fast path); selection,
            # NMS ordering, and subpixel refinement in float32.
            full_resp = response_fn(img).astype(jnp.float32)
            resp = _nms(full_resp, nms_radius)
        uv, score = _grid_topk(resp, grid_rows, grid_cols, kp_by_level[lvl],
                               border)
        uv = _subpixel_refine(full_resp, uv)
        angle = _orientations(img, uv)
        scale = float(2 ** lvl)
        all_uv.append(uv * scale)
        all_score.append(score)
        all_level.append(jnp.full(score.shape, lvl, jnp.int32))
        all_angle.append(angle)

    uv = jnp.concatenate(all_uv, axis=0)
    score = jnp.concatenate(all_score, axis=0)
    level = jnp.concatenate(all_level, axis=0)
    angle = jnp.concatenate(all_angle, axis=0)
    # Mask: finite responses above a floor relative to the strongest corner.
    finite = jnp.isfinite(score)
    floor = min_score_rel * jnp.max(jnp.where(finite, score, 0.0))
    mask = finite & (score > jnp.maximum(floor, 1e-12))
    return Keypoints(uv=uv, score=score, level=level, angle=angle, mask=mask)
