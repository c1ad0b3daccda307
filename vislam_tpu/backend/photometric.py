"""Coarse-to-fine photometric (direct) pose alignment.

Role of the reference's EstimatePoseFeatures Gauss-Newton solver
(/root/reference/src/VISystem.cpp:1113-1448): candidate points with depth in
the previous frame are warped by the current SE(3) estimate into the new
frame (WarpFunctionSE3, :1495-1558), the intensity residual drives a 6-DoF
GN update (per-point 1x6 Jacobian = image gradient x projection Jacobian,
:1281-1338), iterated <=10 times per pyramid level from coarse to fine
(:1181,1214). The reference's Tukey/MAD robust weighting (:1797-1870) is
implemented and ON by default here (it was coded but disabled there).

TPU redesign: the per-point Jacobian loop becomes a batched gather + einsum
over all P points at once; each GN iteration is one fused XLA program; the
level loop is a static Python loop (4 compiled segments); the iteration loop
is a lax.fori_loop.

Pose convention: T_ji = (R, t) maps frame-i camera points to frame-j:
X_j = R X_i + t. Update is left-multiplicative se3, twist [rho, phi].
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from vislam_tpu.lie.se3 import se3_exp
from vislam_tpu.lie.so3 import so3_hat
from vislam_tpu.frontend.pyramid import scharr_gradients


class PhotoResult(NamedTuple):
    R: jnp.ndarray          # (3,3) refined rotation
    t: jnp.ndarray          # (3,) refined translation
    final_error: jnp.ndarray  # () mean robust residual
    num_valid: jnp.ndarray    # () int32 points in view at the finest level


def _bilinear(img, uv):
    """Bilinear sample img (H,W) at uv (...,2); returns (value, valid)."""
    H, W = img.shape
    u, v = uv[..., 0], uv[..., 1]
    valid = (u >= 0) & (u < W - 1.001) & (v >= 0) & (v < H - 1.001)
    u = jnp.clip(u, 0.0, W - 1.001)
    v = jnp.clip(v, 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0
    dv = v - v0
    flat = img.reshape(-1)

    def take(vi, ui):
        return jnp.take(flat, vi * W + ui)

    val = (
        take(v0, u0) * (1 - du) * (1 - dv)
        + take(v0, u0 + 1) * du * (1 - dv)
        + take(v0 + 1, u0) * (1 - du) * dv
        + take(v0 + 1, u0 + 1) * du * dv
    )
    return val, valid


def _tukey_weights(r, mask, c_factor: float = 4.6851):
    """Tukey biweight with MAD scale (reference TukeyFunctionWeights +
    MedianAbsoluteDeviation, /root/reference/src/VISystem.cpp:1797-1870).

    The median is computed over valid residuals via a masked sort (fixed
    shape; masked entries pushed to +inf and ignored by indexing the valid
    count's midpoint)."""
    n_valid = jnp.maximum(jnp.sum(mask), 1)
    big = jnp.float32(1e9)
    abs_r = jnp.where(mask, jnp.abs(r), big)
    sorted_r = jnp.sort(abs_r)
    med = sorted_r[(n_valid - 1) // 2]
    abs_dev = jnp.where(mask, jnp.abs(jnp.abs(r) - med), big)
    mad = jnp.sort(abs_dev)[(n_valid - 1) // 2]
    sigma = 1.4826 * jnp.maximum(mad, 1e-3)
    c = c_factor * sigma
    x = r / c
    w = jnp.where(jnp.abs(x) < 1.0, (1.0 - x * x) ** 2, 0.0)
    return w * mask.astype(r.dtype)


def photometric_align(
    pyr_i: Sequence[jnp.ndarray],
    pyr_j: Sequence[jnp.ndarray],
    points_uv: jnp.ndarray,   # (P, 2) level-0 pixel coords in frame i
    depths: jnp.ndarray,      # (P,) frame-i depths of those pixels
    mask: jnp.ndarray,        # (P,) valid candidates
    R0: jnp.ndarray,          # (3,3) initial R_ji (e.g. IMU)
    t0: jnp.ndarray,          # (3,) initial translation
    fx: float, fy: float, cx: float, cy: float,
    levels: Sequence[int] = (3, 2, 1, 0),
    iters_per_level: int = 10,
    robust: bool = True,
) -> PhotoResult:
    """Direct alignment of frame j to frame i over a candidate point set."""
    # Back-project candidates once (level 0 intrinsics).
    x = (points_uv[:, 0] - cx) / fx
    y = (points_uv[:, 1] - cy) / fy
    X_i = jnp.stack([x * depths, y * depths, depths], -1)  # (P, 3)

    # Reference intensities, sampled at each level (static python loop).
    R, t = R0, t0
    final_err = jnp.float32(0.0)
    num_valid = jnp.int32(0)

    for lvl in levels:
        s = 0.5 ** lvl
        fxl, fyl, cxl, cyl = fx * s, fy * s, cx * s, cy * s
        img_i = pyr_i[lvl]
        img_j = pyr_j[lvl]
        gx_j, gy_j = scharr_gradients(img_j)
        uv_l = points_uv * s
        I_ref, ref_ok = _bilinear(img_i, uv_l)
        base_mask = mask & ref_ok

        def gn_iter(_, carry):
            R, t, err, nv = carry
            X_j = X_i @ R.T + t
            z = X_j[:, 2]
            behind = z <= 1e-3
            safe_z = jnp.where(behind, 1e-3, z)
            iz = 1.0 / safe_z
            u = X_j[:, 0] * iz * fxl + cxl
            v = X_j[:, 1] * iz * fyl + cyl
            uvw = jnp.stack([u, v], -1)
            I_cur, in_view = _bilinear(img_j, uvw)
            gxs, _ = _bilinear(gx_j, uvw)
            gys, _ = _bilinear(gy_j, uvw)
            ok = base_mask & in_view & (~behind)
            r = (I_cur - I_ref) * ok.astype(I_cur.dtype)

            if robust:
                w = _tukey_weights(r, ok)
            else:
                w = ok.astype(r.dtype)

            # J = [gx, gy] * dpi/dX_j * [I | -hat(X_j)]  -> (P, 6)
            iz2 = iz * iz
            # dpi/dX_j rows: (fx iz, 0, -fx x iz2), (0, fy iz, -fy y iz2)
            a1 = gxs * fxl * iz
            a2 = gys * fyl * iz
            a3 = -(gxs * fxl * X_j[:, 0] + gys * fyl * X_j[:, 1]) * iz2
            Jx = jnp.stack([a1, a2, a3], -1)  # (P, 3) d r / d X_j
            Jpose = jnp.concatenate(
                [Jx, -jnp.einsum("pi,pij->pj", Jx, so3_hat(X_j),
                                 preferred_element_type=jnp.float32)],
                axis=-1,
            )  # (P, 6)

            H = jnp.einsum("p,pi,pj->ij", w, Jpose, Jpose,
                           preferred_element_type=jnp.float32)
            b = -jnp.einsum("p,pi,p->i", w, Jpose, r,
                            preferred_element_type=jnp.float32)
            H = H + 1e-4 * jnp.eye(6, dtype=H.dtype)
            dxi = jnp.linalg.solve(H, b)
            dR, dt = se3_exp(dxi)
            R_new = dR @ R
            t_new = dR @ t + dt
            step_ok = jnp.all(jnp.isfinite(dxi))
            R_new = jnp.where(step_ok, R_new, R)
            t_new = jnp.where(step_ok, t_new, t)
            mean_err = jnp.sum(w * r * r) / jnp.maximum(jnp.sum(w), 1e-6)
            return R_new, t_new, mean_err, jnp.sum(ok).astype(jnp.int32)

        R, t, final_err, num_valid = jax.lax.fori_loop(
            0, iters_per_level, gn_iter, (R, t, final_err, num_valid)
        )

    return PhotoResult(R=R, t=t, final_error=final_err, num_valid=num_valid)
