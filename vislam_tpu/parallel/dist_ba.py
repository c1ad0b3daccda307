"""Distributed sliding-window bundle adjustment over a device mesh.

The landmark dimension is sharded across the mesh 'map' axis; each device
builds the normal-equation blocks for its landmark shard, the reduced camera
system (S, rhs) and the pose blocks (Hpp, bp) are summed with psum over ICI,
every device solves the tiny replicated (6W, 6W) system, and landmark updates
back-substitute locally — zero landmark data ever moves between devices.

This is the TPU-native replacement for a capability the reference lacks
entirely (SURVEY.md §2 'Parallelism inventory': none), and the core of
BASELINE.json's north star: 'distributed BA reducing landmark Schur
complements via all-reduce/reduce-scatter collectives over ICI'.

Communication cost per LM iteration: one psum of (W,6,6)+(W,W,6,6)+(W,6)*2
~ O(W^2) floats — independent of L, so scaling efficiency approaches 100%
as L grows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vislam_tpu.backend.ba import (
    BAProblem,
    BAState,
    _apply_update,
    back_substitute_landmarks,
    build_normal_equations,
    reduce_landmarks,
    robust_cost,
    schur_solve,
)


def _axis_size(mesh: Mesh, axis) -> int:
    """Total device count of a (possibly tuple) mesh axis."""
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def shard_problem(state: BAState, prob: BAProblem, mesh: Mesh, axis="map"):
    """Place the problem on the mesh: landmarks sharded, poses replicated.

    axis may be one mesh axis name or a tuple — e.g. ("host", "map") shards
    landmarks jointly over the cross-process DCN axis and the local ICI axis
    (the multi-host production layout; see parallel.mesh.make_global_mesh).
    Pads L up to a multiple of the axis size if needed (masked padding rows).
    Accepts numpy or jax arrays; under multi-process JAX pass numpy/host
    arrays (identical on every process) so device_put can build the global
    sharded arrays from per-process local shards.
    """
    import numpy as np

    n = _axis_size(mesh, axis)
    # Host-side (numpy) padding: under multi-process JAX, intermediate
    # single-device jnp arrays cannot be device_put to a global sharding;
    # plain numpy arrays (identical per process) can.
    X = np.asarray(state.X)
    obs_uv = np.asarray(prob.obs_uv)
    obs_mask = np.asarray(prob.obs_mask)
    L = X.shape[0]
    pad = (-L) % n
    if pad:
        X = np.concatenate([X, np.ones((pad, 3), X.dtype)], 0)
        obs_uv = np.concatenate(
            [obs_uv, np.zeros((obs_uv.shape[0], pad, 2), obs_uv.dtype)], 1)
        obs_mask = np.concatenate(
            [obs_mask, np.zeros((obs_mask.shape[0], pad), bool)], 1)
    state = BAState(
        R=jax.device_put(np.asarray(state.R), NamedSharding(mesh, P())),
        t=jax.device_put(np.asarray(state.t), NamedSharding(mesh, P())),
        X=jax.device_put(X, NamedSharding(mesh, P(axis))),
    )
    prob = BAProblem(
        obs_uv=jax.device_put(obs_uv, NamedSharding(mesh, P(None, axis))),
        obs_mask=jax.device_put(obs_mask, NamedSharding(mesh, P(None, axis))),
        fx=prob.fx, fy=prob.fy, cx=prob.cx, cy=prob.cy,
    )
    return state, prob


def dist_bundle_adjust(
    state: BAState,
    prob: BAProblem,
    mesh: Mesh,
    axis="map",
    iters: int = 8,
    lam0: float = 1e-3,
    huber_delta: float = 2.0,
    fix_first: bool = True,
):
    """Sharded LM loop. state/prob must be placed by shard_problem first.

    axis: one mesh axis name or a tuple (multi-host: ("host", "map") —
    the psum Schur reduction then spans DCN + ICI). Runs unchanged under
    multi-process JAX (see parallel.mesh.distributed_init): every process
    executes the same program on its addressable shards and the collectives
    span the global mesh.
    """
    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    fx, fy, cx, cy = prob.fx, prob.fy, prob.cx, prob.cy  # static scalars

    def lm_scan(R, t, X, obs_uv, obs_mask):
        pr = BAProblem(obs_uv=obs_uv, obs_mask=obs_mask, fx=fx, fy=fy, cx=cx, cy=cy)

        def local_cost(st):
            return jax.lax.psum(robust_cost(st, pr, huber_delta), axis)

        def step(carry, _):
            s, lam, cost = carry
            Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(s, pr, huber_delta)
            dxi, dX = schur_solve(
                Hpp, Hpl, Hll, bp, bl, lam, fix_first, axis_name=axis
            )
            cand = _apply_update(s, dxi, dX)
            cand_cost = local_cost(cand)
            all_dX_finite = (
                jax.lax.psum(jnp.all(jnp.isfinite(dX)).astype(jnp.int32), axis)
                == _axis_size(mesh, axis)
            )
            finite = jnp.isfinite(cand_cost) & jnp.all(jnp.isfinite(dxi)) & all_dX_finite
            accept = finite & (cand_cost < cost)
            new_s = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, s)
            new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8), lam * 4.0)
            new_cost = jnp.where(accept, cand_cost, cost)
            return (new_s, new_lam, new_cost), new_cost

        st = BAState(R=R, t=t, X=X)
        cost0 = local_cost(st)
        (s, lam, cost), costs = jax.lax.scan(
            step, (st, jnp.asarray(lam0, jnp.float32), cost0), None, length=iters
        )
        return s.R, s.t, s.X, costs, cost0

    fn = shard_map(
        lm_scan,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, axis), P(None, axis)),
        out_specs=(P(), P(), P(axis), P(), P()),
        check_vma=False,
    )
    R, t, X, costs, cost0 = jax.jit(fn)(
        state.R, state.t, state.X, prob.obs_uv, prob.obs_mask
    )
    return (
        BAState(R=R, t=t, X=X),
        {"costs": costs, "final_cost": costs[-1], "initial_cost": cost0},
    )


def dist_vi_bundle_adjust(
    state: BAState,
    prob: BAProblem,
    v,
    fac,
    g_w,
    R_bc,
    mesh: Mesh,
    axis="map",
    iters: int = 8,
    lam0: float = 1e-3,
    huber_delta: float = 2.0,
    w_rot: float = 1e4,
    w_vel: float = 1e2,
    w_pos: float = 1e2,
    fixed_mask=None,
    bg0=None,
    ba0=None,
    w_bg_prior: float = 1e4,
    w_ba_prior: float = 3e3,
):
    """Distributed VISUAL-INERTIAL sliding-window BA (the flagship 9-DoF
    window of backend/vi_ba.py, sharded).

    Layout: landmarks + observations sharded on the mesh `axis` (one psum
    per LM iteration reduces the (W,W,6,6) Schur camera system — identical
    communication to the vision-only dist_bundle_adjust, O(W^2) floats,
    independent of L); the IMU/velocity(/bias) blocks are TINY ((9W)^2, or
    (9W+6)^2 with online bias) and are computed replicated on every device;
    the extended reduced system solves replicated; landmark updates
    back-substitute locally. Same math as the single-device
    vi_bundle_adjust — equivalence-tested on the 8-device CPU mesh
    (tests/test_parallel.py). Role: the full optimizer surface of the
    reference (/root/reference/src/VISystem.cpp:1113-1448), distributed.

    state/prob must be placed by shard_problem first. fac: ImuFactors
    (bias-Jacobian fields optional; with bg0/ba0 given, the shared window
    bias co-refines exactly as in vi_bundle_adjust).
    """
    import numpy as np

    from vislam_tpu.backend.vi_ba import (
        ImuFactors,
        _imu_normal_equations,
        _imu_normal_equations_bias,
        imu_cost,
        solve_vi_system,
        solve_vi_system_bias,
    )

    axis = tuple(axis) if isinstance(axis, (tuple, list)) else axis
    fx, fy, cx, cy = prob.fx, prob.fy, prob.cx, prob.cy  # static scalars
    W = int(state.R.shape[0])
    est_bias = fac.has_bias_jacobians and bg0 is not None
    if fixed_mask is None:
        fixed_mask = np.arange(W) == 0
    repl = NamedSharding(mesh, P())
    put = lambda x: jax.device_put(jnp.asarray(x, jnp.float32), repl)
    v = put(v)
    g_w = put(g_w)
    R_bc = put(R_bc)
    fm = jax.device_put(jnp.asarray(fixed_mask, bool), repl)
    fac = jax.tree.map(
        lambda x: None if x is None else jax.device_put(jnp.asarray(x), repl),
        fac, is_leaf=lambda x: x is None)
    if est_bias:
        bias0 = put(jnp.concatenate([jnp.asarray(bg0, jnp.float32),
                                     jnp.asarray(ba0, jnp.float32)]))
    else:
        bias0 = put(jnp.zeros(6, jnp.float32))
    n_dev = _axis_size(mesh, axis)

    def lm_scan(R, t, X, obs_uv, obs_mask, vv0, fc, fmask, b0, gw, Rbc):
        pr = BAProblem(obs_uv=obs_uv, obs_mask=obs_mask,
                       fx=fx, fy=fy, cx=cx, cy=cy)
        # Bias-prior anchors derived from the passed b0 argument — NOT
        # closed-over device arrays (CLAUDE.md hard rule 1: the axon
        # runtime re-uploads every captured device buffer per execution).
        bg0_l, ba0_l = b0[:3], b0[3:]

        def total_cost(st, vel, bias):
            c = jax.lax.psum(robust_cost(st, pr, huber_delta), axis)
            if est_bias:
                bg, ba = bias[:3], bias[3:]
                c = c + imu_cost(st.R, st.t, vel, fc, gw, Rbc,
                                 w_rot, w_vel, w_pos, bg=bg, ba=ba)
                c = c + 0.5 * (w_bg_prior * jnp.sum((bg - bg0_l) ** 2)
                               + w_ba_prior * jnp.sum((ba - ba0_l) ** 2))
            else:
                c = c + imu_cost(st.R, st.t, vel, fc, gw, Rbc,
                                 w_rot, w_vel, w_pos)
            return c

        def step(carry, _):
            st, vel, bias, lam, cost = carry
            Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(
                st, pr, huber_delta)
            # One collective: partial Schur camera system psum-reduced over
            # the landmark shards.
            S, rhs, Hll_inv = reduce_landmarks(
                Hpp, Hpl, Hll, bp, bl, lam, axis_name=axis)
            if est_bias:
                H_imu, b_imu = _imu_normal_equations_bias(
                    st.R, st.t, vel, fc, gw, Rbc, w_rot, w_vel, w_pos,
                    bias[:3], bias[3:], bg0_l, ba0_l,
                    w_bg_prior, w_ba_prior)
                dxi, dv, db = solve_vi_system_bias(
                    S, rhs, H_imu, b_imu, lam, fmask)
            else:
                H_imu, b_imu = _imu_normal_equations(
                    st.R, st.t, vel, fc, gw, Rbc, w_rot, w_vel, w_pos)
                dxi, dv = solve_vi_system(S, rhs, H_imu, b_imu, lam, fmask)
                db = jnp.zeros((6,), jnp.float32)
            dX = back_substitute_landmarks(Hpl, Hll_inv, bl, dxi)
            cand = _apply_update(st, dxi, dX)
            cand_v = vel + dv
            cand_b = bias + db
            cand_cost = total_cost(cand, cand_v, cand_b)
            all_dX_finite = (
                jax.lax.psum(jnp.all(jnp.isfinite(dX)).astype(jnp.int32),
                             axis) == n_dev
            )
            finite = (jnp.isfinite(cand_cost) & jnp.all(jnp.isfinite(dxi))
                      & jnp.all(jnp.isfinite(dv)) & jnp.all(jnp.isfinite(db))
                      & all_dX_finite)
            accept = finite & (cand_cost < cost)
            new_st = jax.tree.map(
                lambda a, b: jnp.where(accept, a, b), cand, st)
            new_v = jnp.where(accept, cand_v, vel)
            new_b = jnp.where(accept, cand_b, bias)
            new_lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-8),
                                lam * 4.0)
            new_cost = jnp.where(accept, cand_cost, cost)
            return (new_st, new_v, new_b, new_lam, new_cost), new_cost

        st = BAState(R=R, t=t, X=X)
        cost0 = total_cost(st, vv0, b0)
        (s, vel, bias, lam, cost), costs = jax.lax.scan(
            step, (st, vv0, b0, jnp.asarray(lam0, jnp.float32), cost0),
            None, length=iters)
        return s.R, s.t, s.X, vel, bias, costs, cost0

    fn = shard_map(
        lm_scan,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(None, axis), P(None, axis),
                  P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P(axis), P(), P(), P(), P()),
        check_vma=False,
    )
    R, t, X, v_out, bias, costs, cost0 = jax.jit(fn)(
        state.R, state.t, state.X, prob.obs_uv, prob.obs_mask,
        v, fac, fm, bias0, g_w, R_bc,
    )
    info = {"costs": costs, "final_cost": costs[-1], "initial_cost": cost0}
    if est_bias:
        return (BAState(R=R, t=t, X=X), v_out, bias[:3], bias[3:]), info
    return (BAState(R=R, t=t, X=X), v_out), info
