"""ORB-style rotated-BRIEF binary descriptors, TPU-native.

Role of the reference's ORB/AKAZE binary-descriptor options
(/root/reference/src/Camera.cpp:114-127) and its Hamming brute-force
matcher (/root/reference/src/MatcherGPU.cpp:16-42 selects BF-Hamming for
binary types), redesigned for the MXU:

Each of the 256 BRIEF tests compares two smoothed-intensity samples at
static offsets (a fixed pattern baked at import from a seeded RNG, like
ORB's learned pattern), rotated per keypoint by its orientation ("steered
BRIEF"). Instead of packing bits, each descriptor is emitted as a
+-1/sqrt(256) float32 vector. For two such unit vectors a, b with bit
vectors x, y:

    ||a - b||^2 = 2 - 2 a.b = 4 * Hamming(x, y) / 256

so squared-L2 ordering IS Hamming ordering — the existing MXU matmul
matcher (frontend/match.py), ratio test, mutual check, and grid dedup all
work unchanged on binary descriptors. This replaces bit-packed XOR+popcount
(great on CPUs, foreign to the MXU) with one dense matmul — the
TPU-idiomatic formulation of Hamming matching.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vislam_tpu.frontend.pyramid import gaussian_blur

BINARY_DIM = 256
_PATCH = 31  # ORB patch diameter; offsets stay inside +-15 px


def _static_pattern(dim: int = BINARY_DIM, patch: int = _PATCH):
    """(dim, 2, 2) static test-pair offsets [(duA,dvA),(duB,dvB)].

    Gaussian-distributed like classic BRIEF (sigma = patch/5), clipped to
    the patch, from a fixed seed so descriptors are reproducible across
    runs/processes (the role of ORB's hardcoded learned pattern).
    """
    rng = np.random.RandomState(1234)
    sigma = patch / 5.0
    half = (patch - 1) / 2.0
    pts = np.clip(rng.randn(dim, 2, 2) * sigma, -half, half)
    return pts.astype(np.float32)


_PATTERN = _static_pattern()  # numpy: embeds as an HLO literal under jit


def _bilinear(img, u, v):
    H, W = img.shape
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    flat = img.reshape(-1)

    def take(vi, ui):
        return jnp.take(flat, vi * W + ui)

    return (
        take(v0i, u0i) * (1 - du) * (1 - dv)
        + take(v0i, u0i + 1) * du * (1 - dv)
        + take(v0i + 1, u0i) * (1 - du) * dv
        + take(v0i + 1, u0i + 1) * du * dv
    )


def describe_binary(img, uv, angle, smooth_sigma: float = 2.0):
    """Describe K keypoints with steered BRIEF-256.

    img: (H, W) float32; uv: (K, 2) level-local pixel coords; angle: (K,).
    Returns (K, 256) float32 unit vectors in {-1,+1}/16 (see module doc).
    """
    img_s = gaussian_blur(img, smooth_sigma, radius=3)

    ca = jnp.cos(angle)[:, None]          # (K, 1)
    sa = jnp.sin(angle)[:, None]
    pat = jnp.asarray(_PATTERN)           # (D, 2, 2)

    def sample(which):
        du = pat[None, :, which, 0]       # (1, D)
        dv = pat[None, :, which, 1]
        ru = ca * du - sa * dv            # (K, D) rotated offsets
        rv = sa * du + ca * dv
        return _bilinear(img_s, uv[:, 0:1] + ru, uv[:, 1:2] + rv)

    bits = sample(0) > sample(1)          # (K, D) bool
    scale = 1.0 / np.sqrt(float(BINARY_DIM))
    return jnp.where(bits, scale, -scale).astype(jnp.float32)


def hamming_from_l2sq(l2sq, dim: int = BINARY_DIM):
    """Exact Hamming distance from the matcher's squared-L2 output."""
    return jnp.round(l2sq * dim / 4.0).astype(jnp.int32)
