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


# ---------------------------------------------------------------- VI variant

def _vi_problem(rng, W=6, L=96, scale_err=0.7):
    """A VI window with a global monocular-scale error — the problem class
    only the 9-DoF VI-BA can fix (scale is invisible to reprojection)."""
    import sys
    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from tests.test_vi_ba import _window, G

    R_cw, t_cw, v, p, X, fac, prob = _window(rng, W=W, L=L)
    # Rescale positions + landmarks about keyframe 0 (reprojection-neutral).
    p0 = np.asarray(p)[0]
    p_s = p0 + scale_err * (np.asarray(p) - p0)
    X_s = p0 + scale_err * (np.asarray(X) - p0)
    t_s = -np.einsum("wij,wj->wi", np.asarray(R_cw), p_s)
    state = BAState(R=jnp.asarray(R_cw), t=jnp.asarray(t_s, jnp.float32),
                    X=jnp.asarray(X_s, jnp.float32))
    v_bad = jnp.asarray(scale_err * np.asarray(v), jnp.float32)
    return state, prob, v_bad, fac, (np.asarray(p), np.asarray(v)), G


def test_dist_vi_ba_matches_single_device(rng):
    """The landmark-sharded 9-DoF VI-BA must agree with the single-device
    vi_bundle_adjust (same LM schedule, same math, psum-reduced Schur)."""
    from vislam_tpu.backend.vi_ba import vi_bundle_adjust
    from vislam_tpu.parallel import dist_vi_bundle_adjust

    state, prob, v, fac, _, G = _vi_problem(rng)
    g_w = jnp.asarray(G)
    R_bc = jnp.eye(3, dtype=jnp.float32)

    # Compare at FULL convergence (exact-data optimum): mid-convergence
    # accept/reject decisions are float-reduction-order sensitive across
    # device counts, so intermediate iterates are not comparable.
    (s_single, v_single), info_s = vi_bundle_adjust(
        state, prob, v, fac, g_w, R_bc, iters=20)

    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    (s_dist, v_dist), info_d = dist_vi_bundle_adjust(
        st_sh, pr_sh, v, fac, g_w, R_bc, mesh, iters=20)

    assert float(info_s["final_cost"]) < 1e-4
    assert float(info_d["final_cost"]) < 1e-4
    np.testing.assert_allclose(
        np.asarray(s_dist.R), np.asarray(s_single.R), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_dist.t), np.asarray(s_single.t), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(v_dist), np.asarray(v_single), atol=2e-3)
    L = s_single.X.shape[0]
    np.testing.assert_allclose(
        np.asarray(s_dist.X)[:L], np.asarray(s_single.X), atol=5e-3)


def test_dist_vi_ba_recovers_scale(rng):
    """Distributed VI-BA must recover the true metric scale from the IMU
    factors — the capability that makes it the flagship (GT-free) mode."""
    from vislam_tpu.parallel import dist_vi_bundle_adjust

    state, prob, v, fac, (p_gt, v_gt), G = _vi_problem(rng, scale_err=0.7)
    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    (s, v_out), info = dist_vi_bundle_adjust(
        st_sh, pr_sh, v, fac, jnp.asarray(G), jnp.eye(3, dtype=jnp.float32),
        mesh, iters=20)
    assert float(info["final_cost"]) < float(info["initial_cost"])
    c_est = -np.einsum("wji,wj->wi", np.asarray(s.R), np.asarray(s.t))
    # Path length back to metric (started at 0.7x).
    el = np.linalg.norm(np.diff(c_est, axis=0), axis=1).sum()
    gl = np.linalg.norm(np.diff(p_gt, axis=0), axis=1).sum()
    assert 0.9 < el / gl < 1.1, el / gl
    assert np.linalg.norm(np.asarray(v_out) - v_gt, axis=-1).max() < 0.15


def test_dist_vi_ba_with_online_bias(rng):
    """Bias-estimating mode: the shared (dbg, dba) block co-refines
    replicated; results must match the single-device solver."""
    from vislam_tpu.backend.vi_ba import vi_bundle_adjust
    from vislam_tpu.parallel import dist_vi_bundle_adjust

    state, prob, v, fac, _, G = _vi_problem(rng)
    W = state.R.shape[0]
    # Attach bias Jacobians (zeros are valid Jacobians for an exact-factor
    # window integrated at the reference bias).
    z = jnp.zeros((W, 3, 3), jnp.float32)
    z3 = jnp.zeros((W, 3), jnp.float32)
    fac_b = fac._replace(J_R_bg=z, J_v_bg=z, J_v_ba=z, J_p_bg=z, J_p_ba=z,
                         bg_ref=z3, ba_ref=z3)
    bg0 = jnp.zeros(3, jnp.float32)
    ba0 = jnp.zeros(3, jnp.float32)
    g_w = jnp.asarray(G)
    R_bc = jnp.eye(3, dtype=jnp.float32)

    (s_s, v_s, bg_s, ba_s), info_s = vi_bundle_adjust(
        state, prob, v, fac_b, g_w, R_bc, iters=20, bg0=bg0, ba0=ba0)
    mesh = make_mesh(8)
    st_sh, pr_sh = shard_problem(state, prob, mesh)
    (s_d, v_d, bg_d, ba_d), info_d = dist_vi_bundle_adjust(
        st_sh, pr_sh, v, fac_b, g_w, R_bc, mesh, iters=20, bg0=bg0, ba0=ba0)

    assert float(info_s["final_cost"]) < 1e-4
    assert float(info_d["final_cost"]) < 1e-4
    # The bias priors leave a slightly flat optimum (velocity<->bias
    # trade-off), so converged states agree to ~1e-2, not 1e-3.
    np.testing.assert_allclose(np.asarray(v_d), np.asarray(v_s), atol=1e-2)
    np.testing.assert_allclose(np.asarray(bg_d), np.asarray(bg_s), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ba_d), np.asarray(ba_s), atol=1e-2)
