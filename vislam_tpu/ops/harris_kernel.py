"""Fused Shi-Tomasi response + NMS Pallas kernel over image tiles.

Role of the detector front half (reference detect path runs OpenCV's CPU/CUDA
detectors; our jnp path is frontend/detect.py). One Pallas program per image
tile computes Scharr gradients, the blurred structure tensor, the
min-eigenvalue response, and 3x3 non-max suppression entirely in VMEM —
one HBM read of the tile + halo and one write of the response, where the
XLA path writes/reads the intermediate gradient and tensor fields.

A VGA-class frame (752x480 f32 = 1.4 MB) fits VMEM whole, so the kernel is a
single program over the halo-padded image — no tiling, no HBM round trips
between stages. (Tiled+halo'd DMA variant becomes worthwhile only beyond
~2 MPix frames.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # covers scharr(1) + gaussian blur radius(3) + nms(2) chain


def _make_gauss(radius: int = 3, sigma: float = 1.5):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


_G = _make_gauss()


def _conv1d_rows(x, k):
    """Convolve along axis 1 (lanes) with small static kernel, SAME."""
    r = len(k) // 2
    out = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        shift = i - r
        out = out + kv * jnp.roll(x, -shift, axis=1)
    return out


def _conv1d_cols(x, k):
    r = len(k) // 2
    out = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        shift = i - r
        out = out + kv * jnp.roll(x, -shift, axis=0)
    return out


def _kernel(img_ref, out_ref):
    img = img_ref[:]
    # Scharr gradients (3x3 separable: smooth [3,10,3]/16, diff [-1,0,1]/2).
    sm = (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0)
    df = (-0.5, 0.0, 0.5)
    gx = _conv1d_rows(_conv1d_cols(img, sm), df)
    gy = _conv1d_cols(_conv1d_rows(img, sm), df)

    # Structure tensor, blurred.
    a = _conv1d_rows(_conv1d_cols(gx * gx, _G), _G)
    b = _conv1d_rows(_conv1d_cols(gx * gy, _G), _G)
    c = _conv1d_rows(_conv1d_cols(gy * gy, _G), _G)
    half_tr = 0.5 * (a + c)
    half_df = 0.5 * (a - c)
    resp = half_tr - jnp.sqrt(half_df * half_df + b * b + 1e-12)

    # 3x3 (radius 2 -> 5x5) NMS via shifted maxima.
    pooled = resp
    for dv in (-2, -1, 0, 1, 2):
        for du in (-2, -1, 0, 1, 2):
            if dv == 0 and du == 0:
                continue
            pooled = jnp.maximum(pooled, jnp.roll(jnp.roll(resp, dv, 0), du, 1))
    nms = jnp.where(resp >= pooled, resp, -jnp.inf)

    # Drop the halo.
    out_ref[:] = nms[_HALO:-_HALO, _HALO:-_HALO]


@partial(jax.jit, static_argnames=("interpret",))
def harris_nms_pallas(img, interpret: bool = False):
    """(H, W) image -> (H, W) NMS'd Shi-Tomasi response (-inf off-peak).

    Equivalent to detect._nms(detect.harris_response(img), radius=2) up to
    boundary handling (the halo ring absorbs the roll wrap; image borders
    are suppressed by the detector's border mask downstream).
    """
    H, W = img.shape
    # Pad with the halo, rounded up so the lane dim stays a multiple of 128.
    pw = (-(W + 2 * _HALO)) % 128
    imgp = jnp.pad(img, ((_HALO, _HALO), (_HALO, _HALO + pw)))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(
            (H, W + pw), jnp.float32
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=H * W * 120, bytes_accessed=H * W * 8, transcendentals=H * W,
        ),
        interpret=interpret,
    )(imgp)
    return out[:H, :W]
