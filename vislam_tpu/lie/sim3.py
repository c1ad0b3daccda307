"""Sim(3) similarity transforms: (R, t, s) with action X -> s R X + t.

Role of Sophus sim3.hpp/rxso3.hpp (/root/reference/thirdparty/sophus), needed
for monocular scale-drift loop correction (a 7-DoF pose graph distributes
accumulated scale error around loops — the classic monocular-SLAM closure).

Tangent layout: [rho(3), phi(3), sigma(1)] — translation, rotation,
log-scale. All ops batched and Taylor-safe (guarded inputs, same policy as
so3.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from vislam_tpu.lie.so3 import so3_exp, so3_hat, so3_log

_SMALL = 1e-6


def sim3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype), jnp.ones((), dtype)


def sim3_compose(A, B):
    """A after B: X -> A(B(X))."""
    Ra, ta, sa = A
    Rb, tb, sb = B
    R = Ra @ Rb
    t = sa[..., None] * (Ra @ tb[..., None])[..., 0] + ta
    return R, t, sa * sb


def sim3_inverse(T):
    R, t, s = T
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return Rt, -inv_s[..., None] * (Rt @ t[..., None])[..., 0], inv_s


def sim3_apply(T, X):
    R, t, s = T
    return s[..., None] * (R @ X[..., None])[..., 0] + t


def _sim3_W(phi, sigma):
    """The W matrix of Sim(3) exp: t = W rho (Sophus sim3.hpp::calcW).

    W = A I + B hat(phi) + C hat(phi)^2 with coefficients depending on
    (theta, sigma); all four regime combinations handled with guarded inputs.
    """
    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _SMALL ** 2))
    small_theta = theta2 < _SMALL ** 2
    small_sigma = jnp.abs(sigma) < _SMALL

    s_exp = jnp.exp(sigma)
    safe_sigma = jnp.where(small_sigma, 1.0, sigma)
    # scale integral A0 = (e^sigma - 1)/sigma
    A0 = jnp.where(small_sigma, 1.0 + 0.5 * sigma, (s_exp - 1.0) / safe_sigma)

    safe_theta = jnp.where(small_theta, 1.0, theta)
    sin_t = jnp.sin(safe_theta)
    cos_t = jnp.cos(safe_theta)
    sig2t2 = safe_sigma * safe_sigma + safe_theta * safe_theta

    # General case (both non-small):
    a_gen = (s_exp * sin_t * safe_sigma + (1.0 - s_exp * cos_t) * safe_theta) / (
        safe_theta * sig2t2
    )
    b_gen = (
        A0
        - ((s_exp * cos_t - 1.0) * safe_sigma + s_exp * sin_t * safe_theta) / sig2t2
    ) / (safe_theta * safe_theta)
    # sigma small: reduces to SO(3) left-Jacobian coefficients.
    a_sig0 = (1.0 - cos_t) / (safe_theta * safe_theta)
    b_sig0 = (safe_theta - sin_t) / (safe_theta ** 3)
    # theta small: series in theta.
    a_th0 = jnp.where(
        small_sigma, 0.5, ((safe_sigma - 1.0) * s_exp + 1.0) / (safe_sigma ** 2)
    )
    b_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s_exp * 0.5 * safe_sigma ** 2 + s_exp - 1.0 - safe_sigma * s_exp)
        / (safe_sigma ** 3),
    )

    A = jnp.where(small_theta, a_th0, jnp.where(small_sigma, a_sig0, a_gen))
    B = jnp.where(small_theta, b_th0, jnp.where(small_sigma, b_sig0, b_gen))

    K = so3_hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return (
        A0[..., None, None] * eye
        + A[..., None, None] * K
        + B[..., None, None] * K2
    )


def sim3_exp(xi):
    """(...,7) [rho, phi, sigma] -> (R, t, s)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    R = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = (W @ rho[..., None])[..., 0]
    return R, t, jnp.exp(sigma)


def sim3_log(T):
    """(R, t, s) -> (...,7) [rho, phi, sigma]."""
    R, t, s = T
    phi = so3_log(R)
    sigma = jnp.log(s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
