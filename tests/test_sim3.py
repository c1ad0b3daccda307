"""Sim(3) math + scale-drift loop correction tests."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.lie.sim3 import (
    sim3_apply,
    sim3_compose,
    sim3_exp,
    sim3_inverse,
    sim3_log,
)
from vislam_tpu.backend.sim3_graph import (
    Sim3Graph,
    optimize_sim3_graph,
    sim3_graph_residuals,
    sim3_odometry_edges,
)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 7)).astype(np.float32) * 0.5
    T = sim3_exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_sim3_small_angle_and_scale(rng):
    for scale in [1e-8, 1e-5, 0.3]:
        xi = (rng.normal(size=(16, 7)) * scale).astype(np.float32)
        T = sim3_exp(jnp.asarray(xi))
        xi2 = np.asarray(sim3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=max(2e-6, scale * 1e-3))


def test_sim3_compose_inverse(rng):
    xi = rng.normal(size=(32, 7)).astype(np.float32) * 0.4
    T = sim3_exp(jnp.asarray(xi))
    I = sim3_compose(T, sim3_inverse(T))
    np.testing.assert_allclose(
        np.asarray(I[0]), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(I[1]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(I[2]), 1.0, atol=1e-5)


def test_sim3_apply_matches_definition(rng):
    R = Rsp.from_rotvec([0.2, -0.1, 0.3]).as_matrix().astype(np.float32)
    t = np.array([1.0, -2.0, 0.5], np.float32)
    s = np.float32(1.7)
    X = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(sim3_apply(
        (jnp.asarray(R), jnp.asarray(t), jnp.asarray(s)), jnp.asarray(X)
    ))
    np.testing.assert_allclose(out, (s * (X @ R.T)) + t, atol=1e-5)


def test_scale_drift_loop_correction():
    """Monocular scale drift around a loop: odometry edges carry per-step
    scale creep; one metric loop edge pins the ends; Sim(3) optimization must
    recover the true scale profile (SE(3) graphs cannot express this)."""
    N = 20
    ang = np.linspace(0, 2 * np.pi, N, endpoint=False)
    R_gt = np.stack([
        Rsp.from_euler("z", a + np.pi / 2).as_matrix() for a in ang
    ]).astype(np.float32)
    t_gt = np.stack([
        [4 * np.cos(a), 4 * np.sin(a), 0.0] for a in ang
    ]).astype(np.float32)
    s_gt = np.ones(N, np.float32)

    # Drifted odometry: integrate relative motions with 2% scale creep/step.
    creep = 1.02
    R_n, t_n, s_n = [R_gt[0]], [t_gt[0]], [1.0]
    for k in range(N - 1):
        dR = R_gt[k].T @ R_gt[k + 1]
        dt = R_gt[k].T @ (t_gt[k + 1] - t_gt[k])
        s_now = s_n[-1] * creep
        R_n.append(R_n[-1] @ dR)
        t_n.append(s_now * (R_n[-2] @ dt) + t_n[-1])
        s_n.append(s_now)
    R_n = np.stack(R_n).astype(np.float32)
    t_n = np.stack(t_n).astype(np.float32)
    s_n = np.asarray(s_n, np.float32)

    # Edges: odometry from the DRIFTED nodes (self-consistent with drift)...
    ei, ej, eR, et, es, w = sim3_odometry_edges(
        jnp.asarray(R_n), jnp.asarray(t_n), jnp.asarray(s_n)
    )
    # ...plus one metric loop edge last->first measured from GT (scale 1).
    from vislam_tpu.lie.sim3 import sim3_compose as comp, sim3_inverse as inv

    T_loop = comp(
        inv((jnp.asarray(R_gt[N - 1]), jnp.asarray(t_gt[N - 1]), jnp.asarray(1.0))),
        (jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0]), jnp.asarray(1.0)),
    )
    ei = jnp.concatenate([ei, jnp.asarray([N - 1], jnp.int32)])
    ej = jnp.concatenate([ej, jnp.asarray([0], jnp.int32)])
    eR = jnp.concatenate([eR, T_loop[0][None]])
    et = jnp.concatenate([et, T_loop[1][None]])
    es = jnp.concatenate([es, T_loop[2][None]])
    w = jnp.concatenate([w, jnp.asarray([20.0])])

    g = Sim3Graph(jnp.asarray(R_n), jnp.asarray(t_n), jnp.asarray(s_n),
                  ei, ej, eR, et, es, w)
    out, info = optimize_sim3_graph(g, iters=20)
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"]), info

    # Scale profile flattened back toward 1 (end-node scale was 1.02^19=1.46).
    s_out = np.asarray(out.s)
    assert s_n[-1] > 1.4
    assert abs(s_out[-1] - 1.0) < 0.1, s_out
    # Positions pulled toward the metric circle.
    err_before = np.linalg.norm(t_n - t_gt, axis=-1).max()
    err_after = np.linalg.norm(np.asarray(out.t) - t_gt, axis=-1).max()
    assert err_after < 0.5 * err_before, (err_before, err_after)
