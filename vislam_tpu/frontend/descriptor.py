"""Batched SIFT-style descriptors (4x4 spatial x 8 orientation bins = 128-D).

Role of the reference's descriptor extraction (SURF/ORB/... via OpenCV
detectAndCompute, /root/reference/src/Camera.cpp:84-92), redesigned as one
batched gather + einsum program: all K keypoints are described in a single
fixed-shape computation — no per-keypoint loops.

TPU formulation: the trilinear spatial soft-assignment weights are *static*
per sample position (a fixed (S, 16) matrix baked at import), and the
orientation soft-assignment is a (K, S, 8) one-hot blend; the histogram is
then a single einsum contraction over samples that lands on the MXU:

    desc[k, cell, obin] = sum_s mag[k,s] * W_spatial[s, cell] * O[k, s, obin]

The descriptor layout is real SIFT: rotated 16x16 gradient samples around the
keypoint, gradient angles relative to the keypoint orientation, Gaussian
spatial weighting, L2-normalize -> clip 0.2 -> renormalize.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from vislam_tpu.frontend.pyramid import scharr_gradients, gaussian_blur

_GRID = 16           # 16x16 gradient samples
_CELLS = 4           # 4x4 spatial cells
_NBINS = 8           # orientation bins
_S = _GRID * _GRID
DESC_DIM = _CELLS * _CELLS * _NBINS  # 128


def _bilinear_gather(img, coords):
    """Sample img (H,W) at float coords (...,2) [u,v] with bilinear interp."""
    H, W = img.shape
    u = coords[..., 0]
    v = coords[..., 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, W - 2)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, H - 2)
    flat = img.reshape(-1)

    def take(vi, ui):
        return jnp.take(flat, vi * W + ui)

    p00 = take(v0i, u0i)
    p01 = take(v0i, u0i + 1)
    p10 = take(v0i + 1, u0i)
    p11 = take(v0i + 1, u0i + 1)
    return (
        p00 * (1 - du) * (1 - dv)
        + p01 * du * (1 - dv)
        + p10 * (1 - du) * dv
        + p11 * du * dv
    )


def _static_geometry(patch_scale: float):
    """Static sample grid: offsets (S,2), spatial-weight matrix (S,16) with
    trilinear cell weights x Gaussian window folded in."""
    step = patch_scale * 2.0 * _CELLS / _GRID
    c = (_GRID - 1) / 2.0
    ii, jj = np.meshgrid(np.arange(_GRID), np.arange(_GRID), indexing="ij")
    dy = (ii - c) * step
    dx = (jj - c) * step
    offs = np.stack([dx.reshape(-1), dy.reshape(-1)], -1).astype(np.float32)

    cell_x = ((jj + 0.5) / _GRID * _CELLS - 0.5).reshape(-1)
    cell_y = ((ii + 0.5) / _GRID * _CELLS - 0.5).reshape(-1)
    r2 = (dx ** 2 + dy ** 2).reshape(-1)
    sigma = _GRID * step / 2.0
    gauss = np.exp(-r2 / (2.0 * sigma * sigma)).astype(np.float32)

    W_sp = np.zeros((_S, _CELLS * _CELLS), np.float32)
    x0 = np.floor(cell_x).astype(int)
    y0 = np.floor(cell_y).astype(int)
    fx = cell_x - x0
    fy = cell_y - y0
    for sx, wx in ((x0, 1.0 - fx), (x0 + 1, fx)):
        for sy, wy in ((y0, 1.0 - fy), (y0 + 1, fy)):
            ok = (sx >= 0) & (sx < _CELLS) & (sy >= 0) & (sy < _CELLS)
            idx = np.clip(sy, 0, _CELLS - 1) * _CELLS + np.clip(sx, 0, _CELLS - 1)
            w = np.where(ok, wx * wy, 0.0) * gauss
            np.add.at(W_sp, (np.arange(_S), idx), w)
    return offs, W_sp


_OFFS, _WSP = _static_geometry(patch_scale=1.5)


_PATCH = 32          # patch side for the patch-based sampling fast path
_PATCH_MARGIN = 3    # blur radius (2) + scharr radius (1): in-patch rows/cols
                     # inside [m, P-1-m] carry exactly the full-image values


def extract_patches(img, uv, P: int):
    """Gather (K, P, P) patches centered (floor) on uv via vmapped
    dynamic_slice — contiguous block gathers, measured ~12x faster than
    per-element gathers on the TPU runtime (BENCH_NOTES round 4).

    Returns (patches, iu0, iv0) where (iu0, iv0) are the patch origins
    (clipped at image borders so patches always stay in-bounds)."""
    H, W = img.shape
    iu0 = jnp.clip(jnp.floor(uv[:, 0]).astype(jnp.int32) - P // 2 + 1, 0, W - P)
    iv0 = jnp.clip(jnp.floor(uv[:, 1]).astype(jnp.int32) - P // 2 + 1, 0, H - P)
    patches = jax.vmap(
        lambda v, u: jax.lax.dynamic_slice(img, (v, u), (P, P))
    )(iv0, iu0)
    return patches, iu0, iv0


def _shift_conv_patches(pat, k, axis: int):
    """1D conv along a patch axis via static shifts (roll); rows/cols within
    the valid margin are exact (wrap contamination stays in the margin)."""
    r = len(k) // 2
    out = jnp.zeros_like(pat)
    for i, kv in enumerate(k):
        s = i - r
        out = out + float(kv) * (pat if s == 0 else jnp.roll(pat, -s, axis=axis))
    return out


def _patch_gradients(patches, smooth_sigma: float):
    """Blur(sigma, radius 2) + Scharr gradients in patch space — pure
    elementwise shift-adds on (K, P, P), replacing four full-image
    single-channel convolutions (~0.8 ms EACH on this runtime)."""
    x = np.arange(-2, 3, dtype=np.float32)
    g = np.exp(-0.5 * (x / smooth_sigma) ** 2)
    g /= g.sum()
    sm = _shift_conv_patches(_shift_conv_patches(patches, g, 1), g, 2)
    sx = (3.0 / 32.0, 10.0 / 32.0, 3.0 / 32.0)
    dx = (-1.0, 0.0, 1.0)
    # Scharr = smooth perpendicular x central-diff along (unit-gain /32).
    gx = _shift_conv_patches(_shift_conv_patches(sm, sx, 1), dx, 2)
    gy = _shift_conv_patches(_shift_conv_patches(sm, sx, 2), dx, 1)
    return gx, gy


def sample_bilinear_patches(fields, lu, lv, lo: float, hi: float):
    """Separable one-hot bilinear sampling inside patches.

    fields: (K, P, P, C); lu/lv: (K, S) local float coords (clipped to
    [lo, hi]).  The bilinear weight factorizes per axis into a 2-nonzero
    row (K, S, P); the sample is then two batched contractions that land
    on the MXU instead of a serialized 131k-element gather (measured
    0.4 ms vs 4.0 ms per field at K=512, S=256)."""
    K_, P = fields.shape[0], fields.shape[1]
    iota = jnp.arange(P, dtype=jnp.float32)
    lu = jnp.clip(lu, lo, hi)
    lv = jnp.clip(lv, lo, hi)
    av = jnp.maximum(0.0, 1.0 - jnp.abs(lv[..., None] - iota))  # (K,S,P)
    au = jnp.maximum(0.0, 1.0 - jnp.abs(lu[..., None] - iota))
    t1 = jnp.einsum("ksp,kpqc->ksqc", av, fields,
                    preferred_element_type=jnp.float32)          # (K,S,P,C)
    return jnp.einsum("ksq,ksqc->ksc", au, t1,
                      preferred_element_type=jnp.float32)        # (K,S,C)


def describe_keypoints(img, uv, angle, smooth_sigma: float = 0.6,
                       upright: bool = False):
    """Describe K keypoints on one image.

    img: (H, W) float32 (the pyramid level the keypoints live on)
    uv: (K, 2) level-local pixel coords; angle: (K,) radians.
    Returns (K, 128) float32 L2-normalized SIFT-style descriptors.

    Round-4 TPU path: full-image blur/gradient convs + float-coord gathers
    (the round-3 formulation) measured 16.2 ms/frame fetch-forced — the
    runtime serializes large gathers and single-channel convs.  This
    version gathers one (K, 32, 32) patch per keypoint (contiguous
    dynamic-slice gathers), computes blur+Scharr in patch space (shift-
    adds), and bilinear-samples via separable one-hot contractions on the
    MXU.  Interior keypoints produce exactly the full-image values (the
    3-px patch margin absorbs the conv support).

    upright=True (STATIC; the framework default — cfg.oriented is off for
    VIO): the sample grid is axis-aligned, so the bilinear weights
    factorize over the 16x16 GRID rows/columns — A, B shrink from
    (K, 256, P) to (K, 16, P), 16x fewer weight FLOPs/bytes. `angle` is
    ignored in this path (it is zero by construction at the call site).
    """
    P = _PATCH
    patches, iu0, iv0 = extract_patches(img, uv, P)
    gxp, gyp = _patch_gradients(patches, smooth_sigma)
    m = float(_PATCH_MARGIN)
    lo, hi = m, P - 1 - m - 1e-3
    fields = jnp.stack([gxp, gyp], axis=-1)  # (K, P, P, 2)

    if upright:
        # Axis-aligned grid: samples (i, j) at (v + dy_i, u + dx_j) with
        # the STATIC 16-point per-axis offsets of _static_geometry
        # (offs[s] = (dx[j], dy[i]), s = i*16 + j).
        dx = jnp.asarray(_OFFS[:_GRID, 0])          # (16,) column offsets
        dy = jnp.asarray(_OFFS[::_GRID, 1])         # (16,) row offsets
        lv = jnp.clip(uv[:, 1:2] + dy[None, :]
                      - iv0[:, None].astype(jnp.float32), lo, hi)  # (K,16)
        lu = jnp.clip(uv[:, 0:1] + dx[None, :]
                      - iu0[:, None].astype(jnp.float32), lo, hi)
        iota = jnp.arange(P, dtype=jnp.float32)
        A = jnp.maximum(0.0, 1.0 - jnp.abs(lv[..., None] - iota))  # (K,16,P)
        B = jnp.maximum(0.0, 1.0 - jnp.abs(lu[..., None] - iota))
        t1 = jnp.einsum("kip,kpqc->kiqc", A, fields,
                        preferred_element_type=jnp.float32)  # (K,16,P,2)
        samp = jnp.einsum("kjq,kiqc->kijc", B, t1,
                          preferred_element_type=jnp.float32)  # (K,16,16,2)
        gxs = samp[..., 0].reshape(uv.shape[0], _S)
        gys = samp[..., 1].reshape(uv.shape[0], _S)
        ca = jnp.ones(uv.shape[0], jnp.float32)
        sa = jnp.zeros(uv.shape[0], jnp.float32)
    else:
        ca = jnp.cos(angle)
        sa = jnp.sin(angle)
        offs = jnp.asarray(_OFFS)  # (S, 2)
        rx = ca[:, None] * offs[None, :, 0] - sa[:, None] * offs[None, :, 1]
        ry = sa[:, None] * offs[None, :, 0] + ca[:, None] * offs[None, :, 1]
        coords = uv[:, None, :] + jnp.stack([rx, ry], axis=-1)  # (K, S, 2)

        lu = coords[..., 0] - iu0[:, None].astype(jnp.float32)
        lv = coords[..., 1] - iv0[:, None].astype(jnp.float32)
        samp = sample_bilinear_patches(fields, lu, lv, lo, hi)
        gxs = samp[..., 0]  # (K, S)
        gys = samp[..., 1]
    # Rotate gradients into the keypoint frame.
    gxr = ca[:, None] * gxs + sa[:, None] * gys
    gyr = -sa[:, None] * gxs + ca[:, None] * gys
    mag = jnp.sqrt(gxr * gxr + gyr * gyr + 1e-12)
    ori = jnp.arctan2(gyr, gxr)

    # Orientation soft-assignment (K, S, 8), GATHER-FREE (round 4): the
    # linear bin weights are the circular tent function
    # w_b = max(0, 1 - dist_circ(obin, b)) — pure elementwise arithmetic.
    # The eye[o0i]/eye[o1i] formulation emitted two (K*S, 8) row gathers,
    # which this runtime serializes (the census's last big custom-call
    # fusions in the step).
    obin = (ori / (2.0 * jnp.pi) + 0.5) * _NBINS - 0.5
    bins = jnp.arange(_NBINS, dtype=jnp.float32)
    d = obin[..., None] - bins  # (K, S, 8)
    d = d - _NBINS * jnp.round(d / _NBINS)  # circular wrap to [-4, 4)
    O = jnp.maximum(0.0, 1.0 - jnp.abs(d))

    # Histogram: contraction over samples lands on the MXU.
    M = mag[..., None] * O  # (K, S, 8)
    desc = jnp.einsum(
        "ksb,sc->kcb", M, jnp.asarray(_WSP),
        preferred_element_type=jnp.float32,
    )  # (K, 16, 8)
    desc = desc.reshape(uv.shape[0], DESC_DIM)

    # SIFT normalization: L2 -> clip 0.2 -> L2.
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    desc = jnp.minimum(desc, 0.2)
    desc = desc / jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-9)
    return desc
