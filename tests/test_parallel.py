"""Distributed-BA tests on the virtual 8-device CPU mesh: the sharded solver
must agree with the single-device solver and actually shard its landmarks."""

import jax
import jax.numpy as jnp
import numpy as np

from vislam_tpu.backend import BAProblem, BAState, bundle_adjust
from vislam_tpu.parallel import dist_bundle_adjust, make_mesh, shard_problem
from tests.test_backend import _make_window, FX, FY, CX, CY


def _perturbed_problem(rng, L=96):
    from scipy.spatial.transform import Rotation as Rsp

    X, R_cw, t_cw, obs, mask = _make_window(rng, W=5, L=L, noise_px=0.3)
    R_p = R_cw.copy(); t_p = t_cw.copy()
    for k in range(1, len(R_cw)):
        R_p[k] = Rsp.from_rotvec(rng.normal(scale=0.008, size=3)).as_matrix() @ R_cw[k]
        t_p[k] = t_cw[k] + rng.normal(scale=0.04, size=3)
    X_p = X + rng.normal(scale=0.15, size=X.shape)
    state = BAState(
        R=jnp.asarray(R_p, jnp.float32), t=jnp.asarray(t_p, jnp.float32),
        X=jnp.asarray(X_p, jnp.float32),
    )
    prob = BAProblem(jnp.asarray(obs), jnp.asarray(mask), FX, FY, CX, CY)
    return state, prob, (X, R_cw, t_cw)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dist_ba_matches_single_device(rng):
    state, prob, _ = _perturbed_problem(rng)
    s_single, info_s = bundle_adjust(state, prob, iters=8)

    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    s_dist, info_d = dist_bundle_adjust(st_sh, pr_sh, mesh, iters=8)

    # Same final cost (deterministic LM with identical damping schedule).
    np.testing.assert_allclose(
        float(info_d["final_cost"]), float(info_s["final_cost"]), rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(s_dist.R), np.asarray(s_single.R), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(s_dist.t), np.asarray(s_single.t), atol=1e-3
    )
    # Landmarks: compare the unpadded prefix (atol covers float reduction-order
    # differences amplified by weakly-observed landmarks).
    L = s_single.X.shape[0]
    np.testing.assert_allclose(
        np.asarray(s_dist.X)[:L], np.asarray(s_single.X), atol=5e-3
    )


def test_dist_ba_landmarks_actually_sharded(rng):
    state, prob, _ = _perturbed_problem(rng, L=96)
    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    # 96 landmarks over 8 devices -> 12 per shard.
    shard_sizes = {s.data.shape[0] for s in st_sh.X.addressable_shards}
    assert shard_sizes == {12}
    obs_shards = {s.data.shape[1] for s in pr_sh.obs_uv.addressable_shards}
    assert obs_shards == {12}


def test_dist_ba_pad_to_mesh(rng):
    # L=100 not divisible by 8: shard_problem pads with masked rows.
    state, prob, _ = _perturbed_problem(rng, L=100)
    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    assert st_sh.X.shape[0] == 104
    s_dist, info = dist_bundle_adjust(st_sh, pr_sh, mesh, iters=6)
    assert float(info["final_cost"]) < float(info["initial_cost"])
    assert np.isfinite(np.asarray(s_dist.X)).all()


def test_dist_ba_converges_to_gt(rng):
    state, prob, (X_gt, R_gt, t_gt) = _perturbed_problem(rng)
    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    s, info = dist_bundle_adjust(st_sh, pr_sh, mesh, iters=10)
    c_est = -np.einsum("wji,wj->wi", np.asarray(s.R), np.asarray(s.t))
    c_gt = -np.einsum("wji,wj->wi", R_gt, t_gt)
    assert np.linalg.norm(c_est - c_gt, axis=-1).max() < 0.02
