"""Fused Shi-Tomasi response + NMS Pallas kernel, row-block tiled with halo.

Role of the detector front half (reference detect path runs OpenCV's CPU/CUDA
detectors; our jnp path is frontend/detect.py). Each grid step DMAs one
halo-padded row block from HBM into a VMEM scratch, computes Scharr
gradients, the blurred structure tensor, the min-eigenvalue response, and
5x5 non-max suppression entirely in VMEM, then writes the block's response +
NMS fields — one HBM read of the block + halo and two writes, where the XLA
path round-trips the intermediate gradient/tensor fields through HBM.

Tiling is REQUIRED, not an optimization: the whole-frame variant needs ~20
live (H, W) f32 temporaries = 34 MB of scoped VMEM at 480x768 — over the
16 MB limit (measured compile OOM). 120-row blocks put the working set at
~10 MB.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8   # covers scharr(1) + gaussian blur radius(3) + nms(2) chain
_BH = 120   # block rows (480 = 4 blocks; multiple of the 8-sublane tile)


def _make_gauss(radius: int = 3, sigma: float = 1.5):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


_G = _make_gauss()


def _roll(x, shift: int, axis: int):
    """jnp.roll with a static zero-shift guard: Mosaic rejects the zero-size
    slice a roll-by-0 lowers to ("vector types must have positive sizes")."""
    if shift == 0:
        return x
    return jnp.roll(x, shift, axis=axis)


def _conv1d_rows(x, k):
    """Convolve along axis 1 (lanes) with small static kernel, SAME."""
    r = len(k) // 2
    out = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        shift = i - r
        out = out + kv * _roll(x, -shift, axis=1)
    return out


def _conv1d_cols(x, k):
    r = len(k) // 2
    out = jnp.zeros_like(x)
    for i, kv in enumerate(k):
        shift = i - r
        out = out + kv * _roll(x, -shift, axis=0)
    return out


def _gauss_taps(radius: int, sigma: float):
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return tuple(float(v) for v in k)


def _scharr_vmem(img):
    """Scharr gradients (3x3 separable: smooth [3,10,3]/16, diff [-1,0,1]/2)."""
    sm = (3.0 / 16.0, 10.0 / 16.0, 3.0 / 16.0)
    df = (-0.5, 0.0, 0.5)
    gx = _conv1d_rows(_conv1d_cols(img, sm), df)
    gy = _conv1d_cols(_conv1d_rows(img, sm), df)
    return gx, gy


def _response_vmem(img, detector: str):
    """Per-pixel corner/blob response, entirely in VMEM — the Pallas
    analogs of the XLA response family in frontend/detect.py
    (DETECTOR_RESPONSES; the reference's detector factory,
    /root/reference/src/Camera.cpp:94-138)."""
    if detector == "shi_tomasi" or detector == "harris":
        gx, gy = _scharr_vmem(img)
        a = _conv1d_rows(_conv1d_cols(gx * gx, _G), _G)
        b = _conv1d_rows(_conv1d_cols(gx * gy, _G), _G)
        c = _conv1d_rows(_conv1d_cols(gy * gy, _G), _G)
        if detector == "harris":
            det = a * c - b * b
            tr = a + c
            return det - 0.04 * tr * tr
        half_tr = 0.5 * (a + c)
        half_df = 0.5 * (a - c)
        return half_tr - jnp.sqrt(half_df * half_df + b * b + 1e-12)
    if detector == "dog":
        # |blur(sigma1=1.0, r=3) - blur(sigma2=1.6, r=4)| (detect.py match).
        k1 = _gauss_taps(3, 1.0)
        k2 = _gauss_taps(4, 1.6)
        b1 = _conv1d_cols(_conv1d_rows(img, k1), k1)
        b2 = _conv1d_cols(_conv1d_rows(img, k2), k2)
        return jnp.abs(b1 - b2)
    if detector == "hessian":
        # det of Hessian of blur(sigma=1.5, r=3) via iterated Scharr.
        k = _gauss_taps(3, 1.5)
        sm_img = _conv1d_cols(_conv1d_rows(img, k), k)
        gx, gy = _scharr_vmem(sm_img)
        gxx, gxy = _scharr_vmem(gx)
        _, gyy = _scharr_vmem(gy)
        return gxx * gyy - gxy * gxy
    if detector == "_gradmag2":
        # Squared gradient magnitude of blur(sigma=1.0, r=3) — the KAZE
        # contrast-factor statistic field (frontend/nonlinear.py
        # contrast_factor), in-kernel so it costs no XLA convs.
        k = _gauss_taps(3, 1.0)
        sm_img = _conv1d_cols(_conv1d_rows(img, k), k)
        gx, gy = _scharr_vmem(sm_img)
        return gx * gx + gy * gy
    if detector == "fast":
        # FAST-16 segment test (detect.py fast_response semantics): ring of
        # 16 shifted copies, circular min-window over 9 contiguous samples.
        from vislam_tpu.frontend.detect import _FAST_RING

        ring = [
            _roll(_roll(img, -int(dv), 0), -int(du), 1)
            for dv, du in _FAST_RING
        ]
        bright = [r - img for r in ring]
        dark = [-b for b in bright]

        def arc_score(d):
            best = None
            for s0 in range(16):
                m = d[s0]
                for s in range(1, 9):
                    m = jnp.minimum(m, d[(s0 + s) % 16])
                best = m if best is None else jnp.maximum(best, m)
            return best

        return jnp.maximum(arc_score(bright), arc_score(dark))
    raise ValueError(f"unknown detector {detector!r}")


def _kernel(detector, img_hbm, out_ref, resp_ref, scratch, sem):
    # Grid is (batch, row_blocks); batch size 1 folds to the unbatched case.
    b = pl.program_id(0)
    i = pl.program_id(1)
    # DMA the halo-padded row block HBM -> VMEM scratch.
    src = img_hbm.at[b, pl.ds(i * _BH, _BH + 2 * _HALO), :]
    cp = pltpu.make_async_copy(src, scratch, sem)
    cp.start()
    cp.wait()
    img = scratch[:]

    resp = _response_vmem(img, detector)

    # 5x5 (radius 2) NMS via shifted maxima.
    pooled = resp
    for dv in (-2, -1, 0, 1, 2):
        for du in (-2, -1, 0, 1, 2):
            if dv == 0 and du == 0:
                continue
            pooled = jnp.maximum(pooled, _roll(_roll(resp, dv, 0), du, 1))
    nms = jnp.where(resp >= pooled, resp, -jnp.inf)

    # Drop the halo rows; both fields are needed downstream (NMS for grid
    # top-k, raw response for subpixel refinement).
    out_ref[0, :, :] = nms[_HALO:-_HALO, :]
    resp_ref[0, :, :] = resp[_HALO:-_HALO, :]


@partial(jax.jit, static_argnames=("interpret", "detector"))
def _harris_nms_batched(imgs, interpret: bool = False,
                        detector: str = "shi_tomasi"):
    """(B, H, W) images -> (nms, resp), both (B, H, W). Batch rides the
    leading grid dimension (needed because pallas_call with an ANY-space
    input cannot be vmapped — the engine's batch/multi-sequence runners
    vmap the whole step)."""
    B, H, W = imgs.shape
    # Pad: halo rows top/bottom (+ rounding rows so H is a block multiple),
    # lane padding so W stays a multiple of 128. Lane halo comes free from
    # the roll wrap-around into the padding columns.
    ph = (-H) % _BH
    pw = (-(W + 2 * _HALO)) % 128
    Hb = H + ph
    Wp = W + 2 * _HALO + pw
    imgp = jnp.pad(imgs, ((0, 0), (_HALO, _HALO + ph), (_HALO, _HALO + pw)))
    grid = Hb // _BH
    out, resp = pl.pallas_call(
        partial(_kernel, detector),
        grid=(B, grid),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hb, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Hb, Wp), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, _BH, Wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BH, Wp), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((_BH + 2 * _HALO, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * 120, bytes_accessed=B * H * W * 12,
            transcendentals=B * H * W,
        ),
        interpret=interpret,
    )(imgp)
    return out[:, :H, _HALO:_HALO + W], resp[:, :H, _HALO:_HALO + W]


def harris_nms_pallas(img, interpret: bool = False,
                      detector: str = "shi_tomasi"):
    """(..., H, W) image(s) -> (nms'd response, raw response), same shape.

    Equivalent to (detect._nms(r, radius=2), r) for
    r = detect.harris_response(img), up to boundary handling (the halo ring
    absorbs the roll wrap; image borders are suppressed by the detector's
    border mask downstream).  Arbitrary leading batch dims fold into the
    kernel grid (see _harris_nms_batched) — this is what lets jax.vmap of
    the engine step (batch/multi-sequence runners) trace through: the
    custom_vmap rule below reroutes batching onto the grid instead of
    failing in pallas_call.
    """
    lead = img.shape[:-2]
    H, W = img.shape[-2:]
    imgs = img.reshape((-1, H, W))
    out, resp = _harris_nms_batched(imgs, interpret=interpret,
                                    detector=detector)
    return out.reshape(*lead, H, W), resp.reshape(*lead, H, W)


# vmap support: reroute a mapped leading axis onto the kernel grid. This is
# the entry the production detector uses — jax.vmap of the engine step
# (batch/multi-sequence runners, engine/batch.py) otherwise dies inside
# pallas_call ("memory space ANY only ... trivial index_map").
def harris_nms_auto(img, detector: str = "shi_tomasi"):
    return _AUTO_BY_DETECTOR[detector](img)


def _make_auto(detector):
    @jax.custom_batching.custom_vmap
    def auto(img):
        return harris_nms_pallas(img, detector=detector)

    @auto.def_vmap
    def _rule(axis_size, in_batched, img):
        out, resp = harris_nms_pallas(img, detector=detector)
        return (out, resp), (True, True)

    return auto


_AUTO_BY_DETECTOR = {
    d: _make_auto(d)
    for d in ("shi_tomasi", "harris", "dog", "hessian", "fast", "_gradmag2")
}
