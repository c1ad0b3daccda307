"""Batched two-view triangulation.

Role of the reference's Triangulate (/root/reference/src/VISystem.cpp:862-923,
which wraps cv::triangulatePoints for per-feature depth debug), rebuilt as
closed-form batched ops: a midpoint method (two-ray least squares, cheap and
robust) and a homogeneous DLT via 4x4 eigendecomposition (the classic
triangulatePoints algorithm), both fixed-shape over M matches.
"""

from __future__ import annotations

import jax.numpy as jnp


def triangulate_midpoint(rays_i, rays_j, R_ji, t_ji):
    """Midpoint triangulation in frame i.

    Geometry: d_j x_j = d_i (R_ji x_i) + t_ji. Solve the 2x2 normal equations
    for (d_i, d_j) per match; the 3D point (frame i) is the midpoint of the
    two closest points.

    Returns (X_i (M,3), depth_i (M,), depth_j (M,), gap (M,)) where gap is the
    closest-approach distance (a quality measure).
    """
    rot = rays_i @ R_ji.T  # frame-j direction of each i-ray
    a = jnp.sum(rot * rot, -1)
    b = -jnp.sum(rot * rays_j, -1)
    c = jnp.sum(rays_j * rays_j, -1)
    rhs1 = -jnp.sum(rot * t_ji[None, :], -1)
    rhs2 = jnp.sum(rays_j * t_ji[None, :], -1)
    det = a * c - b * b
    safe_det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    d_i = (c * rhs1 - b * rhs2) / safe_det
    d_j = (a * rhs2 - b * rhs1) / safe_det

    p_on_i = d_i[:, None] * rot + t_ji[None, :]   # frame-j coords of point on ray i
    p_on_j = d_j[:, None] * rays_j
    gap = jnp.linalg.norm(p_on_i - p_on_j, axis=-1)
    mid_j = 0.5 * (p_on_i + p_on_j)
    # Transform midpoint back to frame i: X_i = R_ji^T (X_j - t_ji).
    X_i = (mid_j - t_ji[None, :]) @ R_ji
    return X_i, d_i, d_j, gap


def triangulate_dlt(uv_i, uv_j, P_i, P_j):
    """Homogeneous DLT triangulation (cv::triangulatePoints semantics).

    uv_*: (M, 2) pixel coords; P_*: (3, 4) projection matrices.
    Returns (M, 3) world points (dehomogenized).
    """
    def rows(uv, P):
        r1 = uv[:, 0:1] * P[2:3, :] - P[0:1, :]
        r2 = uv[:, 1:2] * P[2:3, :] - P[1:2, :]
        return r1, r2

    a1, a2 = rows(uv_i, P_i)
    a3, a4 = rows(uv_j, P_j)
    A = jnp.stack([a1, a2, a3, a4], axis=1)  # (M, 4, 4)
    # Smallest right singular vector of A == smallest eigenvector of A^T A.
    AtA = jnp.einsum("mij,mik->mjk", A, A, preferred_element_type=jnp.float32)
    _, vecs = jnp.linalg.eigh(AtA)
    Xh = vecs[..., 0]  # (M, 4)
    w = Xh[:, 3:4]
    safe_w = jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
    return Xh[:, :3] / safe_w
