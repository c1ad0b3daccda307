"""Batched PnP (3D-2D) pose solve by Gauss-Newton on SE(3).

Used for metric loop-closure measurement: landmarks triangulated in one
keyframe's local (metrically accurate) neighborhood are aligned to their 2D
observations in the loop partner, yielding a full 6-DoF relative transform
that is independent of accumulated drift. Also generally useful (relocalab,
map reuse).

All points are processed in one fixed-shape batch; the GN loop is a
lax.fori_loop with Huber weighting; degenerate cases are masked.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.se3 import se3_exp
from vislam_tpu.lie.so3 import orthonormalize, so3_hat


class PnPResult(NamedTuple):
    R: jnp.ndarray            # (3,3) world(or frame-a)->camera rotation
    t: jnp.ndarray            # (3,)
    inlier_mask: jnp.ndarray  # (N,)
    num_inliers: jnp.ndarray  # () int32
    rmse: jnp.ndarray         # () float32 pixel RMSE over inliers


@partial(jax.jit, static_argnames=("iters",))
def pnp_gn(
    X,            # (N, 3) 3D points (source frame)
    uv,           # (N, 2) observations in the target camera
    mask,         # (N,) valid correspondences
    R0, t0,       # initial target<-source transform
    fx, fy, cx, cy,
    iters: int = 12,
    huber_px: float = 3.0,
    inlier_px: float = 5.0,
) -> PnPResult:
    """Minimize Huber reprojection error of R X + t over SE(3)."""

    def residuals(R, t):
        Xc = X @ R.T + t
        z = Xc[:, 2]
        ok = mask & (z > 1e-3)
        safe_z = jnp.where(z > 1e-3, z, 1e-3)
        u = fx * Xc[:, 0] / safe_z + cx
        v = fy * Xc[:, 1] / safe_z + cy
        r = jnp.stack([u, v], -1) - uv
        return r, Xc, ok

    def body(_, carry):
        R, t = carry
        r, Xc, ok = residuals(R, t)
        rn = jnp.linalg.norm(r, axis=-1)
        w = jnp.where(rn <= huber_px, 1.0, huber_px / jnp.maximum(rn, 1e-9))
        w = w * ok.astype(r.dtype)

        z = jnp.where(Xc[:, 2] > 1e-3, Xc[:, 2], 1e-3)
        iz = 1.0 / z
        iz2 = iz * iz
        zero = jnp.zeros_like(iz)
        A = jnp.stack(
            [
                jnp.stack([fx * iz, zero, -fx * Xc[:, 0] * iz2], -1),
                jnp.stack([zero, fy * iz, -fy * Xc[:, 1] * iz2], -1),
            ],
            axis=-2,
        )  # (N,2,3)
        J = jnp.concatenate(
            [A, -jnp.einsum("nab,nbc->nac", A, so3_hat(Xc),
                            preferred_element_type=jnp.float32)],
            axis=-1,
        )  # (N,2,6)
        H = jnp.einsum("n,nai,naj->ij", w, J, J,
                       preferred_element_type=jnp.float32)
        b = -jnp.einsum("n,nai,na->i", w, J, r,
                        preferred_element_type=jnp.float32)
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        dxi = jnp.linalg.solve(H, b)
        dR, dt = se3_exp(dxi)
        good = jnp.all(jnp.isfinite(dxi))
        R_new = jnp.where(good, orthonormalize(dR @ R), R)
        t_new = jnp.where(good, dR @ t + dt, t)
        return R_new, t_new

    R, t = jax.lax.fori_loop(0, iters, body, (R0, t0))
    r, Xc, ok = residuals(R, t)
    rn = jnp.linalg.norm(r, axis=-1)
    inl = ok & (rn < inlier_px)
    n = jnp.sum(inl)
    rmse = jnp.sqrt(
        jnp.sum(jnp.where(inl, rn * rn, 0.0)) / jnp.maximum(n, 1)
    )
    return PnPResult(R=R, t=t, inlier_mask=inl,
                     num_inliers=n.astype(jnp.int32), rmse=rmse)
