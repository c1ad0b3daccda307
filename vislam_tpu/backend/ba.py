"""Sliding-window bundle adjustment: Levenberg-Marquardt with Schur complement.

This upgrades the reference's frame-pair photometric Gauss-Newton
(/root/reference/src/VISystem.cpp:1113-1448: per-point Jacobian loop, identity
weights, A = J^T J solved densely per pair) to a proper windowed BA over W
keyframe poses and L landmarks, the component the north star requires
(BASELINE.json). Its robust-weight option keeps the reference's Tukey/Huber
role (/root/reference/src/VISystem.cpp:1797-1870) with a Huber kernel.

TPU-first design decisions:
  - Fixed shapes everywhere: (W, L) observation table with a boolean mask —
    no sparse indexing; masked terms contribute zero.
  - All Jacobian blocks are built with batched einsums (land on the MXU).
  - The landmark block Hll is block-diagonal (L, 3, 3): inverted in closed
    form (adjugate / determinant), no per-landmark solve loop.
  - The reduced camera system S is (W*6, W*6) — tiny — solved with Cholesky.
  - The LM loop is a lax.scan with accept/reject damping, fully jittable.
  - The landmark dimension is the natural shard axis: Hll, Hpl and their
    Schur contributions are sums over landmarks, so a mesh-sharded version
    just psums S and rhs (see vislam_tpu/parallel/dist_ba.py).

Pose convention: each keyframe pose is world->camera, X_c = R X_w + t.
Perturbation is left-multiplicative se3 on (R, t): (R, t) <- exp(dxi) (R, t),
twist layout [rho, phi]. Pose 0 is gauge-fixed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.so3 import so3_hat
from vislam_tpu.lie.se3 import se3_exp


class BAProblem(NamedTuple):
    """Static observation data for one window."""

    obs_uv: jnp.ndarray    # (W, L, 2) pixel observations
    obs_mask: jnp.ndarray  # (W, L) bool
    fx: jnp.ndarray        # scalar
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray


class BAState(NamedTuple):
    """Optimizable state."""

    R: jnp.ndarray  # (W, 3, 3) world->camera rotations
    t: jnp.ndarray  # (W, 3)    world->camera translations
    X: jnp.ndarray  # (L, 3)    world landmarks


def reprojection_residuals(state: BAState, prob: BAProblem):
    """r (W, L, 2) and camera-frame points Xc (W, L, 3)."""
    Xc = jnp.einsum(
        "wij,lj->wli", state.R, state.X, preferred_element_type=jnp.float32
    ) + state.t[:, None, :]
    z = Xc[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    u = prob.fx * Xc[..., 0] / safe_z + prob.cx
    v = prob.fy * Xc[..., 1] / safe_z + prob.cy
    r = jnp.stack([u, v], -1) - prob.obs_uv
    return r, Xc


def _huber_weights(r, mask, delta):
    """Per-observation Huber IRLS weight (1 inside, delta/|r| outside)."""
    rn = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(rn <= delta, 1.0, delta / jnp.maximum(rn, 1e-9))
    # Points behind the camera get zero weight.
    return w * mask.astype(r.dtype)


def robust_cost(state: BAState, prob: BAProblem, delta: float):
    r, Xc = reprojection_residuals(state, prob)
    m = prob.obs_mask & (Xc[..., 2] > 1e-3)
    rn = jnp.linalg.norm(r, axis=-1)
    c = jnp.where(rn <= delta, 0.5 * rn * rn, delta * (rn - 0.5 * delta))
    return jnp.sum(c * m.astype(r.dtype))


def build_normal_equations(state: BAState, prob: BAProblem, delta: float):
    """All LM blocks in one batched shot.

    Returns (Hpp (W,6,6), Hpl (W,L,6,3), Hll (L,3,3), bp (W,6), bl (L,3), cost).
    """
    r, Xc = reprojection_residuals(state, prob)
    mask = prob.obs_mask & (Xc[..., 2] > 1e-3)
    w = _huber_weights(r, mask, delta)  # (W, L)

    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    iz = 1.0 / safe_z
    iz2 = iz * iz
    zero = jnp.zeros_like(iz)
    # A = d(pi)/d(Xc): (W, L, 2, 3)
    A = jnp.stack(
        [
            jnp.stack([prob.fx * iz, zero, -prob.fx * x * iz2], -1),
            jnp.stack([zero, prob.fy * iz, -prob.fy * y * iz2], -1),
        ],
        axis=-2,
    )
    # J_pose = A @ [I | -hat(Xc)]: (W, L, 2, 6)
    Jp = jnp.concatenate(
        [A, -jnp.einsum("wlab,wlbc->wlac", A, so3_hat(Xc),
                        preferred_element_type=jnp.float32)],
        axis=-1,
    )
    # J_land = A @ R: (W, L, 2, 3)
    Jl = jnp.einsum("wlab,wbc->wlac", A, state.R, preferred_element_type=jnp.float32)

    wr = w[..., None] * r  # weighted residuals
    Hpp = jnp.einsum("wl,wlai,wlaj->wij", w, Jp, Jp, preferred_element_type=jnp.float32)
    Hll = jnp.einsum("wl,wlai,wlaj->lij", w, Jl, Jl, preferred_element_type=jnp.float32)
    Hpl = jnp.einsum("wl,wlai,wlaj->wlij", w, Jp, Jl, preferred_element_type=jnp.float32)
    bp = -jnp.einsum("wlai,wla->wi", Jp, wr, preferred_element_type=jnp.float32)
    bl = -jnp.einsum("wlai,wla->li", Jl, wr, preferred_element_type=jnp.float32)

    rn = jnp.linalg.norm(r, axis=-1)
    cost = jnp.sum(
        jnp.where(rn <= delta, 0.5 * rn * rn, delta * (rn - 0.5 * delta))
        * mask.astype(r.dtype)
    )
    return Hpp, Hpl, Hll, bp, bl, cost


def _inv3x3(M):
    """Batched closed-form 3x3 inverse (adjugate / det), ridge-regularized."""
    m00, m01, m02 = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    m10, m11, m12 = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    m20, m21, m22 = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    c00 = m11 * m22 - m12 * m21
    c01 = m02 * m21 - m01 * m22
    c02 = m01 * m12 - m02 * m11
    c10 = m12 * m20 - m10 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m02 * m10 - m00 * m12
    c20 = m10 * m21 - m11 * m20
    c21 = m01 * m20 - m00 * m21
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c10 + m02 * c20
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ],
        axis=-2,
    )
    return adj / safe[..., None, None]


def reduce_landmarks(Hpp, Hpl, Hll, bp, bl, lam, axis_name: str | None = None):
    """Eliminate the landmark block: reduced camera system (S, rhs, Hll_inv).

    S (W, W, 6, 6) includes the damped Hpp on the diagonal; rhs (W, 6).
    Sharded mode (axis_name set, running under shard_map with landmarks
    sharded over that mesh axis): Hpp/bp/S/rhs are *partial* sums over the
    local landmark shard and are reduced with psum; the tiny reduced camera
    solve then runs replicated on every device, and the landmark
    back-substitution stays local to each shard. This is the communication
    pattern the north star prescribes (landmark Schur complements reduced
    via collectives, BASELINE.json).
    """
    W = Hpp.shape[0]
    eye3 = jnp.eye(3, dtype=Hll.dtype)
    eye6 = jnp.eye(6, dtype=Hpp.dtype)

    # Marquardt-style multiplicative damping plus an absolute floor: scales
    # with the local curvature and keeps weakly-observed landmark blocks
    # (grazing parallax -> near-singular Hll) safely invertible.
    dll = jnp.diagonal(Hll, axis1=-2, axis2=-1)
    Hll_d = Hll + (lam * dll + 1e-5)[..., None] * eye3[None]
    Hll_inv = _inv3x3(Hll_d)

    # A_{w,l} = Hpl Hll^-1 : (W, L, 6, 3)
    Awl = jnp.einsum("wlij,ljk->wlik", Hpl, Hll_inv, preferred_element_type=jnp.float32)
    # S_{w,v} = delta(w=v) Hpp_w - sum_l A_{w,l} Hpl_{v,l}^T
    S_cross = jnp.einsum("wlik,vljk->wvij", Awl, Hpl, preferred_element_type=jnp.float32)
    S = -S_cross
    rhs_corr = jnp.einsum("wlik,lk->wi", Awl, bl, preferred_element_type=jnp.float32)
    if axis_name is not None:
        # Landmark-sharded: reduce the partial sums over the mesh axis.
        Hpp = jax.lax.psum(Hpp, axis_name)
        bp = jax.lax.psum(bp, axis_name)
        S = jax.lax.psum(S, axis_name)
        rhs_corr = jax.lax.psum(rhs_corr, axis_name)
    dpp = jnp.diagonal(Hpp, axis1=-2, axis2=-1)
    Hpp_d = Hpp + (lam * dpp + 1e-8)[..., None] * eye6[None]
    S = S.at[jnp.arange(W), jnp.arange(W)].add(Hpp_d)
    rhs = bp - rhs_corr
    return S, rhs, Hll_inv


def back_substitute_landmarks(Hpl, Hll_inv, bl, dxi):
    """dX_l = Hll^-1 (bl - sum_w Hpl^T dxi_w) — local to a landmark shard."""
    corr = jnp.einsum("wlij,wi->lj", Hpl, dxi, preferred_element_type=jnp.float32)
    return jnp.einsum("lij,lj->li", Hll_inv, bl - corr,
                      preferred_element_type=jnp.float32)


def schur_solve(Hpp, Hpl, Hll, bp, bl, lam, fix_first: int = 1,
                axis_name: str | None = None, fixed_mask=None):
    """Damped Schur-complement solve.

    Returns (dxi (W,6), dX (L,3)). The landmark system is eliminated in
    closed form; the reduced (6W, 6W) camera system is solved with Cholesky.
    """
    W = Hpp.shape[0]
    S, rhs, Hll_inv = reduce_landmarks(Hpp, Hpl, Hll, bp, bl, lam, axis_name)

    Sm = S.transpose(0, 2, 1, 3).reshape(W * 6, W * 6)
    rm = rhs.reshape(W * 6)
    # Gauge fixing: zero the fixed poses' rows/cols with identity diagonal.
    # One fixed pose pins the 6-DoF frame; monocular problems need a second
    # to pin the scale (7th gauge DoF). `fixed_mask` (W,) overrides the
    # first-n convention — e.g. fixing BOTH window ends keeps the live
    # anchor untouched for online refinement (no feedback instability).
    if fixed_mask is not None:
        free = jnp.repeat(~fixed_mask, 6)
        Sm = jnp.where(free[:, None] & free[None, :], Sm, 0.0)
        diag = jnp.arange(W * 6)
        Sm = Sm.at[diag, diag].add(jnp.where(free, 0.0, 1.0))
        rm = jnp.where(free, rm, 0.0)
    elif int(fix_first):
        n_fixed = int(fix_first)
        g = jnp.arange(W * 6)
        free = g >= 6 * n_fixed
        Sm = jnp.where(free[:, None] & free[None, :], Sm, 0.0)
        fixed_idx = jnp.arange(6 * n_fixed)
        Sm = Sm.at[fixed_idx, fixed_idx].set(1.0)
        rm = jnp.where(free, rm, 0.0)

    # Cholesky with a small ridge for safety.
    L = jnp.linalg.cholesky(Sm + 1e-8 * jnp.eye(W * 6, dtype=Sm.dtype))
    dxi = jax.scipy.linalg.cho_solve((L, True), rm).reshape(W, 6)

    dX = back_substitute_landmarks(Hpl, Hll_inv, bl, dxi)
    return dxi, dX


def _apply_update(state: BAState, dxi, dX) -> BAState:
    dR, dt = se3_exp(dxi)  # (W,3,3), (W,3)
    R_new = jnp.einsum("wij,wjk->wik", dR, state.R, preferred_element_type=jnp.float32)
    t_new = jnp.einsum("wij,wj->wi", dR, state.t, preferred_element_type=jnp.float32) + dt
    return BAState(R=R_new, t=t_new, X=state.X + dX)


@partial(jax.jit, static_argnames=("iters", "fix_first"))
def bundle_adjust(
    state: BAState,
    prob: BAProblem,
    iters: int = 8,
    lam0: float = 1e-3,
    huber_delta: float = 2.0,
    fix_first: int = 1,
    fixed_mask=None,
):
    """LM loop with accept/reject damping, as a lax.scan (fixed iters).

    fixed_mask (W,) bool overrides fix_first with an arbitrary gauge set.
    Returns (state, info dict with per-iter cost and final lambda).
    """

    def step(carry, _):
        state, lam, cost = carry
        Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(state, prob, huber_delta)
        dxi, dX = schur_solve(Hpp, Hpl, Hll, bp, bl, lam, fix_first,
                              fixed_mask=fixed_mask)
        cand = _apply_update(state, dxi, dX)
        cand_cost = robust_cost(cand, prob, huber_delta)
        # Reject non-finite steps outright (a NaN state would otherwise mask
        # out every observation and score a spurious zero cost).
        finite = jnp.isfinite(cand_cost) & jnp.all(jnp.isfinite(dxi)) & jnp.all(
            jnp.isfinite(dX)
        )
        accept = finite & (cand_cost < cost)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, state
        )
        new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), lam * 4.0)
        new_cost = jnp.where(accept, cand_cost, cost)
        return (new_state, new_lam, new_cost), new_cost

    cost0 = robust_cost(state, prob, huber_delta)
    (state, lam, cost), costs = jax.lax.scan(
        step, (state, jnp.asarray(lam0, jnp.float32), cost0), None, length=iters
    )
    return state, {"costs": costs, "final_cost": cost, "initial_cost": cost0, "lam": lam}
