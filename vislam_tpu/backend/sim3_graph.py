"""Sim(3) pose-graph optimization: monocular scale-drift loop correction.

Monocular odometry drifts in SCALE as well as pose; closing a loop with an
SE(3) graph leaves the scale inconsistency in place. The classic fix
(Strasdat et al.) optimizes 7-DoF similarity nodes so the loop's scale error
distributes along the trajectory.

TPU design: per-edge residuals r_e = log(S_meas^-1 S_i^-1 S_j) in sim(3);
Jacobians by forward-mode autodiff of the right-perturbed residual at zero
(exact, batched with vmap — 14 columns per edge); dense (7N, 7N) GN with
node-0 gauge fixed (7 DoF: frame + global scale); damped accept/reject loop.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vislam_tpu.lie.sim3 import (
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)
from vislam_tpu.lie.so3 import orthonormalize


class Sim3Graph(NamedTuple):
    R: jnp.ndarray        # (N, 3, 3)
    t: jnp.ndarray        # (N, 3)
    s: jnp.ndarray        # (N,)
    edge_i: jnp.ndarray   # (E,)
    edge_j: jnp.ndarray   # (E,)
    edge_R: jnp.ndarray   # (E, 3, 3) measured S_ij = S_i^-1 S_j
    edge_t: jnp.ndarray   # (E, 3)
    edge_s: jnp.ndarray   # (E,)
    edge_weight: jnp.ndarray  # (E,)


def _edge_residual(Ti, Tj, Tm, eps_i, eps_j):
    """r = log(Tm^-1 (Ti exp(eps_i))^-1 (Tj exp(eps_j)))."""
    Ti_p = sim3_compose(Ti, sim3_exp(eps_i))
    Tj_p = sim3_compose(Tj, sim3_exp(eps_j))
    return sim3_log(
        sim3_compose(sim3_inverse(Tm), sim3_compose(sim3_inverse(Ti_p), Tj_p))
    )


def sim3_graph_residuals(g: Sim3Graph):
    Ti = (g.R[g.edge_i], g.t[g.edge_i], g.s[g.edge_i])
    Tj = (g.R[g.edge_j], g.t[g.edge_j], g.s[g.edge_j])
    Tm = (g.edge_R, g.edge_t, g.edge_s)
    z = jnp.zeros((g.edge_i.shape[0], 7))
    return jax.vmap(_edge_residual)(Ti, Tj, Tm, z, z)


@partial(jax.jit, static_argnames=("iters",))
def optimize_sim3_graph(g: Sim3Graph, iters: int = 12, lam0: float = 1e-4):
    """Damped GN over (R, t, s) nodes. Returns (Sim3Graph, info)."""
    N = g.R.shape[0]

    def build(R, t, s, lam):
        Ti = (R[g.edge_i], t[g.edge_i], s[g.edge_i])
        Tj = (R[g.edge_j], t[g.edge_j], s[g.edge_j])
        Tm = (g.edge_R, g.edge_t, g.edge_s)
        z = jnp.zeros((g.edge_i.shape[0], 7))

        r = jax.vmap(_edge_residual)(Ti, Tj, Tm, z, z)           # (E, 7)
        Ji = jax.vmap(jax.jacfwd(_edge_residual, argnums=3))(Ti, Tj, Tm, z, z)
        Jj = jax.vmap(jax.jacfwd(_edge_residual, argnums=4))(Ti, Tj, Tm, z, z)

        w = g.edge_weight
        H = jnp.zeros((N, 7, N, 7))
        b = jnp.zeros((N, 7))
        wj = w[:, None, None]
        H = H.at[g.edge_i, :, g.edge_i, :].add(wj * jnp.einsum("eki,ekj->eij", Ji, Ji))
        H = H.at[g.edge_j, :, g.edge_j, :].add(wj * jnp.einsum("eki,ekj->eij", Jj, Jj))
        Hij = wj * jnp.einsum("eki,ekj->eij", Ji, Jj)
        H = H.at[g.edge_i, :, g.edge_j, :].add(Hij)
        H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(Hij, -1, -2))
        b = b.at[g.edge_i].add(-w[:, None] * jnp.einsum("eki,ek->ei", Ji, r))
        b = b.at[g.edge_j].add(-w[:, None] * jnp.einsum("eki,ek->ei", Jj, r))

        Hm = H.reshape(N * 7, N * 7)
        bm = b.reshape(N * 7)
        Hm = Hm + jnp.diag(lam * jnp.diagonal(Hm) + 1e-8)
        idx = jnp.arange(N * 7)
        free = idx >= 7  # gauge: fix node 0 (frame + global scale)
        Hm = jnp.where(free[:, None] & free[None, :], Hm, 0.0)
        Hm = Hm.at[jnp.arange(7), jnp.arange(7)].set(1.0)
        bm = jnp.where(free, bm, 0.0)
        L = jnp.linalg.cholesky(Hm + 1e-8 * jnp.eye(N * 7))
        dx = jax.scipy.linalg.cho_solve((L, True), bm).reshape(N, 7)
        cost = jnp.sum(w[:, None] * r * r)
        return dx, cost

    def apply(R, t, s, dx):
        dR, dt, ds = sim3_exp(dx)
        R_n = orthonormalize(jnp.einsum("nij,njk->nik", R, dR))
        t_n = s[:, None] * jnp.einsum("nij,nj->ni", R, dt) + t
        return R_n, t_n, s * ds

    def cost_of(R, t, s):
        gg = g._replace(R=R, t=t, s=s)
        r = sim3_graph_residuals(gg)
        return jnp.sum(g.edge_weight[:, None] * r * r)

    def step(carry, _):
        R, t, s, lam, cost = carry
        dx, _ = build(R, t, s, lam)
        R_c, t_c, s_c = apply(R, t, s, dx)
        cand = cost_of(R_c, t_c, s_c)
        ok = jnp.isfinite(cand) & (cand < cost) & jnp.all(jnp.isfinite(dx))
        R_n = jnp.where(ok, R_c, R)
        t_n = jnp.where(ok, t_c, t)
        s_n = jnp.where(ok, s_c, s)
        lam_n = jnp.where(ok, jnp.maximum(lam * 0.3, 1e-9), lam * 5.0)
        cost_n = jnp.where(ok, cand, cost)
        return (R_n, t_n, s_n, lam_n, cost_n), cost_n

    cost0 = cost_of(g.R, g.t, g.s)
    (R, t, s, lam, cost), costs = jax.lax.scan(
        step, (g.R, g.t, g.s, jnp.asarray(lam0, jnp.float32), cost0), None,
        length=iters,
    )
    return g._replace(R=R, t=t, s=s), {
        "initial_cost": cost0, "final_cost": cost, "costs": costs,
    }


def sim3_odometry_edges(R_seq, t_seq, s_seq, weight: float = 1.0):
    """Consecutive-node edges S_ij = S_i^-1 S_j from a node sequence."""
    Ti = (R_seq[:-1], t_seq[:-1], s_seq[:-1])
    Tj = (R_seq[1:], t_seq[1:], s_seq[1:])
    M = sim3_compose(sim3_inverse(Ti), Tj)
    E = R_seq.shape[0] - 1
    return (
        jnp.arange(E, dtype=jnp.int32),
        jnp.arange(1, E + 1, dtype=jnp.int32),
        M[0], M[1], M[2],
        jnp.full((E,), weight, jnp.float32),
    )
