"""Image pyramid and gradient ops.

Role of the reference's per-frame pyramid build by repeated 0.5x resize
(/root/reference/src/Camera.cpp:63-72) and Scharr gradients per level
(/root/reference/src/Camera.cpp:167-184), as XLA-fusable convolution/pool ops.

All functions take (H, W) float32 images; everything is static-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _conv2d_same(img, kernel):
    """2D correlation with SAME padding on a single-channel image."""
    k = jnp.asarray(kernel, img.dtype)
    out = jax.lax.conv_general_dilated(
        img[None, None, :, :],
        k[None, None, :, :],
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0, 0]


def build_pyramid(image, num_levels: int):
    """List of `num_levels` images, each 2x downsampled by 2x2 average pooling.

    Average pooling (vs the reference's INTER_LINEAR resize) is the natural
    anti-aliased 0.5x on TPU. A reduce_window formulation measured faster
    (round 4, fetch-forced: ~0 us vs 134 us/frame) but was REJECTED: its
    different bf16 rounding order perturbs detected keypoints enough to
    flip the window-BA corrupted-anchor recovery test (a genuinely
    bistable property; tests/test_refine.py) — 4.6% of the frame budget is
    not worth destabilizing it. Strided-slice adds measured 4690 us (the
    runtime serializes strided slices — never use them on the hot path).
    """
    levels = [image]
    cur = image
    for _ in range(num_levels - 1):
        h, w = cur.shape
        cur = cur[: h - h % 2, : w - w % 2]
        cur = cur.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        levels.append(cur)
    return levels


_SCHARR_X = np.array(
    [[-3.0, 0.0, 3.0], [-10.0, 0.0, 10.0], [-3.0, 0.0, 3.0]], np.float32
) / 32.0
_SCHARR_Y = _SCHARR_X.T


def scharr_gradients(img):
    """(gx, gy) Scharr derivatives, normalized to unit gain."""
    return _conv2d_same(img, _SCHARR_X), _conv2d_same(img, _SCHARR_Y)


def gaussian_blur(img, sigma: float = 1.5, radius: int = 3):
    """Separable Gaussian blur (two 1D convs; XLA fuses them)."""
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    out = _conv2d_same(img, k[None, :])
    return _conv2d_same(out, k[:, None])
