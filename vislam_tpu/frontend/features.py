"""Per-frame feature extraction: pyramid -> detect -> describe, one jit graph.

Role of the reference's Camera::Update + detectAndComputeFeatures
(/root/reference/src/Camera.cpp:63-92) producing the per-frame Frame record
(/root/reference/include/Camera.hpp:46-67), as a single fixed-shape pytree.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.frontend.pyramid import build_pyramid
from vislam_tpu.frontend.detect import detect_keypoints
from vislam_tpu.frontend.descriptor import describe_keypoints
from vislam_tpu.utils.config import FrontendConfig


class Features(NamedTuple):
    """Fixed-capacity per-frame features (the engine's Frame analog)."""

    uv: jnp.ndarray      # (K, 2) float32, level-0 pixel coords
    desc: jnp.ndarray    # (K, D) float32
    score: jnp.ndarray   # (K,) float32
    level: jnp.ndarray   # (K,) int32
    angle: jnp.ndarray   # (K,) float32
    mask: jnp.ndarray    # (K,) bool

    @property
    def count(self):
        return jnp.sum(self.mask)


@partial(jax.jit, static_argnames=("cfg",))
def extract_features(image, cfg: FrontendConfig = FrontendConfig()) -> Features:
    """image: (H, W) float32 in [0, 255] -> Features with K = cfg.max_keypoints.

    With cfg.levels_used > 1, detection AND description run per pyramid level
    (descriptors sampled on the keypoint's own level for scale invariance —
    the role of the reference's multi-scale SURF/KAZE detectors); uv is
    always reported in level-0 pixels.
    """
    # Image-plane ops (pyramid + detection responses) run in cfg.image_dtype
    # (bf16 default: 2.5x VPU/bandwidth win, BENCH_NOTES round 2); keypoint
    # selection, subpixel refinement, and descriptors run in float32.
    image = image.astype(jnp.dtype(cfg.image_dtype))
    if cfg.scale_space == "nonlinear":
        from vislam_tpu.frontend.nonlinear import nonlinear_scale_space

        pyr = nonlinear_scale_space(image, cfg.num_levels)
    else:
        pyr = build_pyramid(image, cfg.num_levels)
    kps = detect_keypoints(
        pyr,
        grid_rows=cfg.grid_rows,
        grid_cols=cfg.grid_cols,
        kp_per_cell=cfg.kp_per_cell_by_level,
        nms_radius=cfg.nms_radius,
        min_score_rel=cfg.min_score,
        border=cfg.patch_size // 2 + 4,
        levels_used=cfg.levels_used,
        detector=cfg.detector,
        use_pallas=cfg.use_pallas_detector,
    )
    angle = kps.angle if cfg.oriented else jnp.zeros_like(kps.angle)
    if cfg.descriptor == "brief":
        from vislam_tpu.frontend.binary_desc import describe_binary as _describe
        _dkw = {}
    else:
        _describe = describe_keypoints
        # Upright (angle-free) descriptors take the grid-factorized
        # sampling fast path (descriptor.py round 4).
        _dkw = {"upright": not cfg.oriented}
    cells = cfg.grid_rows * cfg.grid_cols
    descs = []
    off = 0
    for lvl in range(cfg.levels_used):
        K_lvl = cells * cfg.kp_per_cell_by_level[lvl]
        sl = slice(off, off + K_lvl)
        off += K_lvl
        scale = float(2 ** lvl)
        descs.append(
            _describe(pyr[lvl].astype(jnp.float32), kps.uv[sl] / scale,
                      angle[sl], **_dkw)
        )
    desc = jnp.concatenate(descs, axis=0)
    return Features(
        uv=kps.uv, desc=desc, score=kps.score,
        level=kps.level, angle=kps.angle, mask=kps.mask,
    )
