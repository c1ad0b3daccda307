"""Essential-matrix estimation: vectorized 8-point RANSAC + pose recovery.

Role of the reference's EstimatePoseFeaturesRansac
(/root/reference/src/VISystem.cpp:1655-1794), which wraps OpenCV's
findEssentialMat + recoverPose. Needed for vision-only rotation (KITTI has
no IMU; EUROC runs can cross-check the IMU rotation).

TPU design: H RANSAC hypotheses are solved simultaneously — each from 8
random correspondences via the normal-equations 8-point algorithm (smallest
eigenvector of a (9, 9) Gram matrix, batched eigh), scored against all M
matches with one (H, 9) x (9, M) matmul of algebraic epipolar residuals.
The winner is re-fit on its inliers, projected onto the essential manifold
(SVD), and decomposed into the 4 (R, t) candidates with a batched-cheirality
vote — all fixed shapes, one jit program.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.so3 import orthonormalize


class EssentialEstimate(NamedTuple):
    R_ji: jnp.ndarray         # (3, 3) rotation frame i -> frame j
    t_dir: jnp.ndarray        # (3,) unit translation (frame j), scale-free
    E: jnp.ndarray            # (3, 3) essential matrix
    inlier_mask: jnp.ndarray  # (M,)
    num_inliers: jnp.ndarray  # () int32


def _epipolar_design(rays_i, rays_j):
    """Rows a_k of the 8-point design matrix: kron(x_i, x_j) layout (M, 9)
    for the constraint x_j^T E x_i = 0 with E row-major flattened."""
    xi = rays_i
    xj = rays_j
    return jnp.stack(
        [
            xj[:, 0] * xi[:, 0], xj[:, 0] * xi[:, 1], xj[:, 0] * xi[:, 2],
            xj[:, 1] * xi[:, 0], xj[:, 1] * xi[:, 1], xj[:, 1] * xi[:, 2],
            xj[:, 2] * xi[:, 0], xj[:, 2] * xi[:, 1], xj[:, 2] * xi[:, 2],
        ],
        axis=-1,
    )


def _smallest_evec_9(G):
    """Batched smallest eigenvector of symmetric (..., 9, 9)."""
    _, vecs = jnp.linalg.eigh(G)
    return vecs[..., 0]


def _decompose_essential(E, rays_i, rays_j, weights):
    """4-way (R, t) decomposition + cheirality vote. Returns best (R, t)."""
    U, S, Vt = jnp.linalg.svd(E)
    # Enforce proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])       # (4, 3, 3)
    cands_t = jnp.stack([t, -t, t, -t])          # (4, 3)

    def depth_votes(R, tdir):
        # Midpoint depths for all matches; count both-positive.
        rot = rays_i @ R.T
        a = jnp.sum(rot * rot, -1)
        b = -jnp.sum(rot * rays_j, -1)
        c = jnp.sum(rays_j * rays_j, -1)
        rhs1 = -jnp.sum(rot * tdir[None, :], -1)
        rhs2 = jnp.sum(rays_j * tdir[None, :], -1)
        det = a * c - b * b
        det = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        d_i = (c * rhs1 - b * rhs2) / det
        d_j = (a * rhs2 - b * rhs1) / det
        return jnp.sum(((d_i > 0) & (d_j > 0)) * weights)

    votes = jax.vmap(depth_votes)(cands_R, cands_t)
    best = jnp.argmax(votes)
    return cands_R[best], cands_t[best]


def ransac_essential(
    rays_i,
    rays_j,
    mask,
    key,
    num_hyps: int = 256,
    thresh: float = 0.01,
    uv_i=None,
    dispersion_pow: float = 0.0,
) -> EssentialEstimate:
    """Full two-view relative pose from correspondences alone.

    rays_*: (M, 3) unit camera rays; mask: (M,) valid matches.
    thresh is on the normalized algebraic residual |x_j^T E x_i| with
    ||E||_F = sqrt(2) (unit translation, rotation-orthonormal essential).

    dispersion_pow > 0 (with uv_i, (M, 2) frame-i pixels): hypothesis
    score = inliers x (inlier spatial std)^pow — the moving-occluder
    defense of pose.ransac_translation, applied to the vision-only path
    (KITTI streets have independent movers too).
    """
    M = rays_i.shape[0]
    A = _epipolar_design(rays_i, rays_j)  # (M, 9)
    w = mask.astype(jnp.float32)

    # --- Hypotheses: 8 weighted-random matches each.
    logits = jnp.log(w + 1e-9)
    idx = jax.random.categorical(key, logits, shape=(num_hyps, 8))
    A_h = A[idx]                                       # (H, 8, 9)
    G = jnp.einsum("hki,hkj->hij", A_h, A_h, preferred_element_type=jnp.float32)
    e_h = _smallest_evec_9(G)                          # (H, 9)

    # Normalize each candidate E to ||E||_F = sqrt(2) so thresh is comparable.
    e_h = e_h * (jnp.sqrt(2.0) / jnp.maximum(
        jnp.linalg.norm(e_h, axis=-1, keepdims=True), 1e-12))

    # --- Score all hypotheses: (H, 9) x (9, M).
    resid = jnp.abs(e_h @ A.T)                         # (H, M)
    inl_tab = (resid < thresh) * w[None, :]
    votes = jnp.sum(inl_tab, axis=1)
    if dispersion_pow > 0.0 and uv_i is not None:
        uvn = uv_i / jnp.asarray(
            [jnp.max(uv_i[:, 0]) + 1.0, jnp.max(uv_i[:, 1]) + 1.0])
        nv = jnp.maximum(votes, 1.0)[:, None]
        mu = (inl_tab @ uvn) / nv
        second = (inl_tab @ (uvn * uvn)) / nv
        disp = jnp.sqrt(jnp.maximum(jnp.sum(second - mu * mu, -1), 1e-12))
        votes = votes * disp ** dispersion_pow
    best = jnp.argmax(votes)
    e_best = e_h[best]

    # --- Iterative refit on inliers (two IRLS-style rounds).
    e_fit = e_best
    for _ in range(2):
        inl0 = (jnp.abs(A @ e_fit) < thresh) & mask
        wi = inl0.astype(jnp.float32)
        G_full = jnp.einsum("m,mi,mj->ij", wi, A, A,
                            preferred_element_type=jnp.float32)
        e_fit = _smallest_evec_9(G_full + 1e-9 * jnp.eye(9))
        e_fit = e_fit * (jnp.sqrt(2.0) / jnp.maximum(jnp.linalg.norm(e_fit), 1e-12))
    wi = ((jnp.abs(A @ e_fit) < thresh) & mask).astype(jnp.float32)
    E = e_fit.reshape(3, 3)

    R, t = _decompose_essential(E, rays_i, rays_j, wi)
    R = orthonormalize(R)

    inl = (jnp.abs(A @ e_fit) < thresh) & mask
    return EssentialEstimate(
        R_ji=R,
        t_dir=t,
        E=E,
        inlier_mask=inl,
        num_inliers=jnp.sum(inl).astype(jnp.int32),
    )
