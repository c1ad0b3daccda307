"""Pose-graph optimization and loop-closure detection tests."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.backend.pose_graph import (
    PoseGraph,
    odometry_edges,
    optimize_pose_graph,
    pose_graph_residuals,
)
from vislam_tpu.backend.loop import (
    detect_loop_candidates,
    global_descriptors,
)


def _circle_trajectory(N=24, radius=5.0):
    """Ground-truth poses around a circle, heading tangent."""
    ang = np.linspace(0, 2 * np.pi, N, endpoint=False)
    R, t = [], []
    for a in ang:
        yaw = a + np.pi / 2
        R.append(Rsp.from_euler("z", yaw).as_matrix())
        t.append([radius * np.cos(a), radius * np.sin(a), 0.0])
    return np.array(R, np.float32), np.array(t, np.float32)


def test_zero_residual_at_consistent_graph():
    R, t = _circle_trajectory()
    ei, ej, eR, et, w = odometry_edges(jnp.asarray(R), jnp.asarray(t))
    pg = PoseGraph(jnp.asarray(R), jnp.asarray(t), ei, ej, eR, et, w)
    r = np.asarray(pose_graph_residuals(pg))
    assert np.abs(r).max() < 1e-5


def test_pose_graph_corrects_drift():
    R_gt, t_gt = _circle_trajectory(N=24)
    # Odometry edges from GT (perfect relative measurements)...
    ei, ej, eR, et, w = odometry_edges(jnp.asarray(R_gt), jnp.asarray(t_gt))
    # ...but the integrated trajectory has accumulated drift.
    rng = np.random.default_rng(0)
    R_n, t_n = [R_gt[0]], [t_gt[0]]
    for k in range(23):
        dR = np.asarray(eR[k])
        dt = np.asarray(et[k])
        # Inject odometry noise when integrating.
        dR_noisy = Rsp.from_rotvec(rng.normal(scale=0.01, size=3)).as_matrix() @ dR
        dt_noisy = dt + rng.normal(scale=0.02, size=3)
        R_n.append(R_n[-1] @ dR_noisy)
        t_n.append(R_n[-2] @ dt_noisy + t_n[-1])
    R_n = np.array(R_n, np.float32)
    t_n = np.array(t_n, np.float32)
    drift_before = np.linalg.norm(t_n - t_gt, axis=-1)

    # Add a loop edge last->first (measured from GT: T_23_0).
    from vislam_tpu.lie.se3 import se3_compose, se3_inverse

    T_loop = se3_compose(
        se3_inverse((jnp.asarray(R_gt[23]), jnp.asarray(t_gt[23]))),
        (jnp.asarray(R_gt[0]), jnp.asarray(t_gt[0])),
    )
    ei2 = jnp.concatenate([ei, jnp.asarray([23], jnp.int32)])
    ej2 = jnp.concatenate([ej, jnp.asarray([0], jnp.int32)])
    eR2 = jnp.concatenate([eR, T_loop[0][None]])
    et2 = jnp.concatenate([et, T_loop[1][None]])
    w2 = jnp.concatenate([w, jnp.asarray([10.0])])

    pg = PoseGraph(jnp.asarray(R_n), jnp.asarray(t_n), ei2, ej2, eR2, et2, w2)
    out, info = optimize_pose_graph(pg, iters=15)
    assert float(info["final_cost"]) < 0.05 * float(info["initial_cost"])
    drift_after = np.linalg.norm(np.asarray(out.t) - t_gt, axis=-1)
    # Loop closure should cut the worst drift substantially.
    assert drift_after.max() < 0.5 * drift_before.max()
    assert drift_after.mean() < 0.12


def test_padded_edges_are_ignored():
    R, t = _circle_trajectory(N=8)
    ei, ej, eR, et, w = odometry_edges(jnp.asarray(R), jnp.asarray(t))
    # Append garbage padding edges with weight 0.
    pad_n = 4
    ei2 = jnp.concatenate([ei, jnp.zeros(pad_n, jnp.int32)])
    ej2 = jnp.concatenate([ej, jnp.zeros(pad_n, jnp.int32)])
    eR2 = jnp.concatenate([eR, jnp.tile(jnp.eye(3), (pad_n, 1, 1))])
    et2 = jnp.concatenate([et, jnp.full((pad_n, 3), 77.0)])
    w2 = jnp.concatenate([w, jnp.zeros(pad_n)])
    pg = PoseGraph(jnp.asarray(R), jnp.asarray(t), ei2, ej2, eR2, et2, w2)
    out, info = optimize_pose_graph(pg, iters=3)
    np.testing.assert_allclose(np.asarray(out.t), t, atol=1e-4)


def test_loop_candidate_detection(rng):
    W, K, D = 12, 32, 16
    desc = rng.normal(size=(W, K, D)).astype(np.float32)
    # Make keyframe 10 look like keyframe 1.
    desc[10] = desc[1] + 0.01 * rng.standard_normal((K, D)).astype(np.float32)
    mask = np.ones((W, K), bool)
    g = global_descriptors(jnp.asarray(desc), jnp.asarray(mask))
    cands = detect_loop_candidates(g, jnp.ones(W, bool), min_separation=5,
                                   sim_thresh=0.8)
    pairs = set(
        (int(a), int(b))
        for a, b, m in zip(
            np.asarray(cands.idx_a), np.asarray(cands.idx_b), np.asarray(cands.mask)
        )
        if m
    )
    assert (1, 10) in pairs, pairs
