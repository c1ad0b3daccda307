"""SE(3) rigid transforms as (R, t) pairs of jnp arrays.

Role of Sophus se3.hpp (/root/reference/thirdparty/sophus/se3.hpp) and the
reference's 4x4-matrix helpers (/root/reference/src/Plus.cpp:116-323), rebuilt
batched and differentiable. A transform is the tuple ``(R, t)`` with R (...,3,3)
and t (...,3); ``se3_apply((R,t), p) = R @ p + t``. Twists are (...,6) laid out
as [rho(3), phi(3)] — translation part first, rotation part second.
"""

from __future__ import annotations

import jax.numpy as jnp

from vislam_tpu.lie.so3 import (
    so3_exp,
    so3_hat,
    so3_log,
    so3_left_jacobian,
    so3_left_jacobian_inv,
)


def se3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype)


def se3_exp(xi):
    """Twist (...,6) [rho, phi] -> (R, t)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    J = so3_left_jacobian(phi)
    t = (J @ rho[..., None])[..., 0]
    return R, t


def se3_log(T):
    """(R, t) -> twist (...,6) [rho, phi]."""
    R, t = T
    phi = so3_log(R)
    Jinv = so3_left_jacobian_inv(phi)
    rho = (Jinv @ t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(A, B):
    """A then-applied-after B: result maps p -> A(B(p))."""
    Ra, ta = A
    Rb, tb = B
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def se3_inverse(T):
    R, t = T
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def se3_apply(T, p):
    """Apply transform to points p (...,3) (broadcasts)."""
    R, t = T
    return (R @ p[..., None])[..., 0] + t


def se3_matrix(T):
    """(R, t) -> homogeneous 4x4 (batched)."""
    R, t = T
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(M):
    return M[..., :3, :3], M[..., :3, 3]


def se3_adjoint(T):
    """Adjoint (...,6,6) mapping twists: Ad_T = [[R, hat(t)R], [0, R]]."""
    R, t = T
    tR = so3_hat(t) @ R
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([zero, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)
