"""SO(3) exponential/logarithm maps and Jacobians on jnp arrays.

Role of Sophus so3.hpp in the reference (/root/reference/thirdparty/sophus/so3.hpp),
rebuilt as batched, differentiable jnp ops.

Numerical-safety pattern used throughout: non-smooth primitives (sqrt at 0,
arccos at +-1, x/sin(x) at 0) receive *guarded inputs* — not just guarded
outputs — because jnp.where does not stop the gradient of the unselected
branch from contaminating the result with NaN/inf.
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL_SQ = 1e-10   # theta^2 below this uses Taylor branches (theta < 1e-5)
_ACOS_EPS = 1e-7


def so3_hat(w):
    """(...,3) rotation vector -> (...,3,3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    m = jnp.stack(
        [zero, -wz, wy, wz, zero, -wx, -wy, wx, zero], axis=-1
    )
    return m.reshape(w.shape[:-1] + (3, 3))


def so3_vee(m):
    """(...,3,3) skew matrix -> (...,3) vector (inverse of so3_hat)."""
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def _safe_theta(theta2):
    """sqrt with guarded input; only valid where theta2 >= _SMALL_SQ."""
    return jnp.sqrt(jnp.maximum(theta2, _SMALL_SQ))


def _exp_coeffs(theta2):
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) from theta^2, grad-safe."""
    small = theta2 < _SMALL_SQ
    t = _safe_theta(theta2)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(t) / t)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(t)) / jnp.maximum(theta2, _SMALL_SQ))
    c = jnp.where(
        small,
        1.0 / 6.0 - theta2 / 120.0,
        (t - jnp.sin(t)) / jnp.maximum(theta2 * t, _SMALL_SQ),
    )
    return a, b, c


def so3_exp(w):
    """Rotation vector (...,3) -> rotation matrix (...,3,3) (Rodrigues)."""
    theta2 = jnp.sum(w * w, axis=-1)
    a, b, _ = _exp_coeffs(theta2)
    K = so3_hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * K2


def so3_log(R):
    """Rotation matrix (...,3,3) -> rotation vector (...,3).

    Three regimes, all with guarded inputs so grad is NaN-free:
      small:   w ~= 0.5 * (1 + theta^2/6) * vee(R - R^T), theta^2 from trace
      generic: w = theta / (2 sin theta) * vee(R - R^T)
      near pi: axis from dominant column of R + I, angle pi - arcsin(|antisym|/2)
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    # Guarded arccos: clip keeps d(arccos)/dx finite everywhere.
    theta = jnp.arccos(jnp.clip(cos_theta, -1.0 + _ACOS_EPS, 1.0 - _ACOS_EPS))
    theta2_smooth = 2.0 * (1.0 - cos_theta)  # ~= theta^2 for small theta, smooth in R

    antisym = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )

    small = cos_theta > 1.0 - 1e-7          # theta < ~4.5e-4
    near_pi = cos_theta < -1.0 + 1e-6       # theta > pi - ~1.4e-3

    # Small branch: smooth in R, no sqrt/arccos involved.
    small_branch = antisym * (0.5 * (1.0 + theta2_smooth / 6.0))[..., None]

    # Generic branch. sin(theta) bounded away from 0 by the arccos clip.
    generic = antisym * (theta / (2.0 * jnp.sin(theta)))[..., None]

    # Near-pi branch: R + I ~= 2 a a^T; take the column with largest diagonal.
    B = R + jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(B, k[..., None, None], axis=-1)[..., 0]
    col_norm = jnp.sqrt(jnp.sum(col * col, axis=-1, keepdims=True) + 1e-12)
    axis = col / col_norm
    sgn = jnp.sign(jnp.sum(axis * antisym, axis=-1, keepdims=True))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    # Better-conditioned angle near pi: sin(theta) = |antisym| / 2.
    sin_theta_pi = 0.5 * jnp.sqrt(jnp.sum(antisym * antisym, axis=-1) + 1e-14)
    theta_pi = jnp.pi - jnp.arcsin(jnp.clip(sin_theta_pi, 0.0, 1.0 - _ACOS_EPS))
    pi_branch = axis * sgn * theta_pi[..., None]

    out = jnp.where(small[..., None], small_branch, generic)
    return jnp.where(near_pi[..., None], pi_branch, out)


def orthonormalize(R):
    """Project a near-rotation back onto SO(3): two Newton iterations of the
    symmetric orthogonalization R <- R (3I - R^T R) / 2.

    Kills orthogonality error eps to O(eps^2) per iteration. Cheap (two 3x3
    matmuls each) and branch-free — used wherever rotations are composed
    repeatedly (pose anchors), since a composition of the form A B B^T
    DOUBLES any orthogonality error of B each time it runs.
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    for _ in range(2):
        R = R @ (1.5 * eye - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp((w+dw)^) ~= exp((J_l dw)^) exp(w^)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, b, c = _exp_coeffs(theta2)
    K = so3_hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * K2


def so3_left_jacobian_inv(w):
    """Inverse left Jacobian, grad-safe."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < _SMALL_SQ
    t = _safe_theta(theta2)
    half = 0.5 * t
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / jnp.maximum(theta2, _SMALL_SQ),
    )
    K = so3_hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * K2
