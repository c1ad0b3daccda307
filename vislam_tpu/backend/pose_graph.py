"""Pose-graph optimization (loop correction).

A capability the reference lacks (its pose track is open-loop composition,
/root/reference/src/VISystem.cpp:1567-1635) but the north star requires
(BASELINE.json config #4: KITTI seq 00 with pose-graph loop correction).

Fixed-shape TPU design: up to N node poses and E edges (masked), residual
r_e = log(T_meas_e^-1 T_i^-1 T_j) in se(3); Gauss-Newton with the standard
small-residual Jacobian approximation (J_j = I, J_i = -Ad(T_j^-1 T_i));
the (6N, 6N) normal matrix is materialized dense (N is keyframe-scale, not
landmark-scale) and solved with Cholesky; node 0 is gauge-fixed. All edge
work is batched einsums; the GN loop is a lax.scan.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.se3 import se3_adjoint, se3_compose, se3_exp, se3_inverse, se3_log


class PoseGraph(NamedTuple):
    """Problem data. Poses are world->body (R, t) like BA; edges constrain
    T_ij = T_i^-1 T_j (the relative pose of node j in node i's frame)."""

    R: jnp.ndarray          # (N, 3, 3)
    t: jnp.ndarray          # (N, 3)
    edge_i: jnp.ndarray     # (E,) int32
    edge_j: jnp.ndarray     # (E,) int32
    edge_R: jnp.ndarray     # (E, 3, 3) measured relative rotations
    edge_t: jnp.ndarray     # (E, 3)
    edge_weight: jnp.ndarray  # (E,) residual weight (0 = padding)


def pose_graph_residuals(pg: PoseGraph):
    """(E, 6) se(3) residuals of all edges."""
    Ri = pg.R[pg.edge_i]
    ti = pg.t[pg.edge_i]
    Rj = pg.R[pg.edge_j]
    tj = pg.t[pg.edge_j]
    # T_i^-1 T_j
    T_ij = se3_compose(se3_inverse((Ri, ti)), (Rj, tj))
    # T_meas^-1 (T_i^-1 T_j)
    T_err = se3_compose(se3_inverse((pg.edge_R, pg.edge_t)), T_ij)
    return se3_log(T_err)


@partial(jax.jit, static_argnames=("iters", "fix_first"))
def optimize_pose_graph(pg: PoseGraph, iters: int = 10, lam0: float = 1e-4,
                        fix_first: bool = True):
    """Damped GN over all node poses. Returns (PoseGraph, info)."""
    N = pg.R.shape[0]
    E = pg.edge_i.shape[0]

    def build_and_solve(R, t, lam):
        g = pg._replace(R=R, t=t)
        r = pose_graph_residuals(g)                     # (E, 6)
        w = pg.edge_weight                              # (E,)
        # Jacobians (right perturbation): J_j = I, J_i = -Ad(T_j^-1 T_i).
        Ri, ti = R[pg.edge_i], t[pg.edge_i]
        Rj, tj = R[pg.edge_j], t[pg.edge_j]
        T_ji = se3_compose(se3_inverse((Rj, tj)), (Ri, ti))
        Ji = -se3_adjoint(T_ji)                         # (E, 6, 6)
        eye6 = jnp.eye(6, dtype=R.dtype)
        Jj = jnp.broadcast_to(eye6, Ji.shape)

        # Assemble dense H (N, 6, N, 6) and b (N, 6) by scatter-add.
        H = jnp.zeros((N, 6, N, 6), R.dtype)
        b = jnp.zeros((N, 6), R.dtype)
        wj = w[:, None, None]
        Hii = wj * jnp.einsum("eki,ekj->eij", Ji, Ji)
        Hjj = wj * jnp.einsum("eki,ekj->eij", Jj, Jj)
        Hij = wj * jnp.einsum("eki,ekj->eij", Ji, Jj)
        bi = -w[:, None] * jnp.einsum("eki,ek->ei", Ji, r)
        bj = -w[:, None] * jnp.einsum("eki,ek->ei", Jj, r)
        H = H.at[pg.edge_i, :, pg.edge_i, :].add(Hii)
        H = H.at[pg.edge_j, :, pg.edge_j, :].add(Hjj)
        H = H.at[pg.edge_i, :, pg.edge_j, :].add(Hij)
        H = H.at[pg.edge_j, :, pg.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[pg.edge_i].add(bi)
        b = b.at[pg.edge_j].add(bj)

        Hm = H.reshape(N * 6, N * 6)
        bm = b.reshape(N * 6)
        diag = jnp.diagonal(Hm)
        Hm = Hm + jnp.diag(lam * diag + 1e-8)
        if fix_first:
            idx = jnp.arange(N * 6)
            free = idx >= 6
            Hm = jnp.where(free[:, None] & free[None, :], Hm, 0.0)
            Hm = Hm.at[jnp.arange(6), jnp.arange(6)].set(1.0)
            bm = jnp.where(free, bm, 0.0)
        L = jnp.linalg.cholesky(Hm + 1e-8 * jnp.eye(N * 6, dtype=Hm.dtype))
        dx = jax.scipy.linalg.cho_solve((L, True), bm).reshape(N, 6)
        cost = jnp.sum(w[:, None] * r * r)
        return dx, cost

    def apply(R, t, dx):
        dR, dt = se3_exp(dx)
        # Right-multiplicative update: T <- T exp(dx).
        R_new = jnp.einsum("nij,njk->nik", R, dR)
        t_new = jnp.einsum("nij,nj->ni", R, dt) + t
        return R_new, t_new

    def cost_of(R, t):
        g = pg._replace(R=R, t=t)
        r = pose_graph_residuals(g)
        return jnp.sum(pg.edge_weight[:, None] * r * r)

    def step(carry, _):
        R, t, lam, cost = carry
        dx, _ = build_and_solve(R, t, lam)
        R_c, t_c = apply(R, t, dx)
        cand = cost_of(R_c, t_c)
        ok = jnp.isfinite(cand) & (cand < cost) & jnp.all(jnp.isfinite(dx))
        R_n = jnp.where(ok, R_c, R)
        t_n = jnp.where(ok, t_c, t)
        lam_n = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9), lam * 5.0)
        cost_n = jnp.where(ok, cand, cost)
        return (R_n, t_n, lam_n, cost_n), cost_n

    cost0 = cost_of(pg.R, pg.t)
    (R, t, lam, cost), costs = jax.lax.scan(
        step, (pg.R, pg.t, jnp.asarray(lam0, pg.R.dtype), cost0), None,
        length=iters,
    )
    return pg._replace(R=R, t=t), {
        "initial_cost": cost0, "final_cost": cost, "costs": costs,
    }


def odometry_edges(R_seq, t_seq, weight: float = 1.0):
    """Consecutive-pose odometry edges from a trajectory (world->body poses)."""
    N = R_seq.shape[0]
    ei = jnp.arange(N - 1, dtype=jnp.int32)
    ej = ei + 1
    T_ij = se3_compose(
        se3_inverse((R_seq[:-1], t_seq[:-1])), (R_seq[1:], t_seq[1:])
    )
    return ei, ej, T_ij[0], T_ij[1], jnp.full((N - 1,), weight, jnp.float32)
