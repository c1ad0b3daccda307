"""Visual-inertial windowed BA: scale observability and exactness.

The decisive property: a global rescaling of the window (positions +
landmarks) leaves the reprojection cost untouched (monocular gauge freedom)
but violates the preintegrated-IMU factors — so VI-BA must recover the true
scale with only ONE gauge-fixed pose, which vision-only BA cannot.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.backend.ba import BAProblem, BAState
from vislam_tpu.backend.vi_ba import (
    ImuFactors,
    imu_cost,
    imu_residuals,
    vi_bundle_adjust,
)

FX = FY = 400.0
CX, CY = 320.0, 240.0
G = np.array([0.0, 0.0, -9.81], np.float32)


def _window(rng, W=6, L=48, dt=0.4):
    """GT window: poses on an arc, landmarks ahead, consistent IMU factors."""
    ts = np.arange(W) * dt
    p = np.stack([0.8 * ts, 0.15 * np.sin(ts), 0.05 * ts], -1).astype(np.float32)
    v = np.gradient(p, dt, axis=0).astype(np.float32)
    yaw = 0.08 * ts
    R_wb = Rsp.from_euler("z", yaw[:, None]).as_matrix().astype(np.float32)
    # camera == body; world->camera
    R_cw = np.transpose(R_wb, (0, 2, 1))
    t_cw = -np.einsum("wij,wj->wi", R_cw, p)

    X = np.stack([
        rng.uniform(-2, 4, L), rng.uniform(-1.5, 1.5, L), rng.uniform(4, 9, L),
    ], -1).astype(np.float32)

    Xc = np.einsum("wij,lj->wli", R_cw, X) + t_cw[:, None, :]
    u = FX * Xc[..., 0] / Xc[..., 2] + CX
    vpix = FY * Xc[..., 1] / Xc[..., 2] + CY
    obs = np.stack([u, vpix], -1).astype(np.float32)
    mask = (Xc[..., 2] > 0.5) & (u > 0) & (u < 640) & (vpix > 0) & (vpix < 480)

    # Exact preintegrated factors derived from the GT states.
    dR = np.einsum("wji,wjk->wik", R_wb[:-1], R_wb[1:])
    dv = np.einsum("wji,wj->wi", R_wb[:-1], v[1:] - v[:-1] - G * dt)
    dp = np.einsum(
        "wji,wj->wi", R_wb[:-1],
        p[1:] - p[:-1] - v[:-1] * dt - 0.5 * G * dt * dt,
    )
    pad = lambda a: np.concatenate([np.zeros_like(a[:1]), a], 0)
    fac = ImuFactors(
        dR=jnp.asarray(np.concatenate([np.eye(3, dtype=np.float32)[None],
                                       dR], 0)),
        dv=jnp.asarray(pad(dv.astype(np.float32))),
        dp=jnp.asarray(pad(dp.astype(np.float32))),
        dt=jnp.asarray(np.concatenate([[0.0], np.full(W - 1, dt)]).astype(np.float32)),
        valid=jnp.asarray(np.concatenate([[False], np.ones(W - 1, bool)])),
    )
    prob = BAProblem(obs_uv=jnp.asarray(obs), obs_mask=jnp.asarray(mask),
                     fx=FX, fy=FY, cx=CX, cy=CY)
    return (jnp.asarray(R_cw), jnp.asarray(t_cw), jnp.asarray(v),
            jnp.asarray(p), jnp.asarray(X), fac, prob)


def test_exact_factors_have_zero_residual(rng):
    R_cw, t_cw, v, p, X, fac, prob = _window(rng)
    r = np.asarray(imu_residuals(R_cw, t_cw, v, fac, jnp.asarray(G),
                                 jnp.eye(3)))
    assert np.abs(r[1:]).max() < 1e-4, r
    c = float(imu_cost(R_cw, t_cw, v, fac, jnp.asarray(G), jnp.eye(3),
                       1e4, 1e2, 1e2))
    assert c < 1e-4


def test_vi_ba_recovers_monocular_scale(rng):
    R_cw, t_cw, v, p, X, fac, prob = _window(rng)
    W = R_cw.shape[0]

    # Rescale the whole window by 0.75 about pose 0 (the classic monocular
    # scale drift): reprojection cost is UNCHANGED by this, IMU cost is not.
    s = 0.75
    p0 = p[0]
    p_bad = p0 + s * (p - p0)
    X_bad = p0 + s * (X - p0)
    v_bad = s * v
    t_cw_bad = -jnp.einsum("wij,wj->wi", R_cw, p_bad)

    state0 = BAState(R=R_cw, t=t_cw_bad, X=X_bad)
    (ref, v_ref), info = vi_bundle_adjust(
        state0, prob, v_bad, fac, jnp.asarray(G), jnp.eye(3),
        iters=25, w_rot=1e4, w_vel=1e2, w_pos=1e2,
    )

    # Recovered inter-keyframe baseline scale vs GT.
    p_ref = -jnp.einsum("wji,wj->wi", ref.R, ref.t)
    base_gt = np.linalg.norm(np.diff(np.asarray(p), axis=0), axis=-1)
    base_ref = np.linalg.norm(np.diff(np.asarray(p_ref), axis=0), axis=-1)
    ratio = base_ref / base_gt
    assert np.abs(ratio - 1.0).max() < 0.02, f"scale ratios {ratio}"
    # Velocities recovered too.
    v_err = np.linalg.norm(np.asarray(v_ref - v), axis=-1)
    assert v_err.max() < 0.05, f"velocity errors {v_err}"
    # And the total cost actually dropped.
    assert float(info["final_cost"]) < 0.01 * float(info["initial_cost"])


def test_vi_ba_improves_gt_free_engine_ate():
    """End-to-end: GT-free (IMU-scale) engine run with in-loop VI-BA must
    beat the same run without BA on both ATE and velocity error.

    This exercises the full chain: engine preintegration accumulation ->
    window IMU factors -> pre-BA reprojection/gap outlier gate ->
    'ends'-gauge VI window solve -> velocity feedback into the IMU-scale
    channel. (Without the outlier gate the scale collapses to ~0.5x —
    measured; this test pins the fix.)
    """
    import dataclasses

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=80, n_landmarks=300, seed=0)
    )
    calib = seq["calib"]

    def run(vi_ba):
        cfg = SystemConfig()
        if vi_ba:
            cfg = dataclasses.replace(
                cfg, backend=dataclasses.replace(cfg.backend, vi_factors=True)
            )
        else:
            # Baseline = UNSUPERVISED open loop (round 5): the default
            # open loop now carries the shadow-chain supervision, which on
            # gentle warm runs matches or beats VI-BA (measured ensemble:
            # open 0.263 vs VI-BA 0.220 mean, open WINS gentle seeds) — so
            # "VI-BA beats the default open loop on THIS gentle scenario"
            # is no longer the right invariant. What this test pins is the
            # full VI-factor chain (preintegration -> window factors ->
            # outlier gate -> 'ends' VI solve -> velocity feedback), which
            # must beat the raw inertially-propagated run.
            cfg = dataclasses.replace(
                cfg, engine=dataclasses.replace(
                    cfg.engine, vi_align_bootstrap=False))
        eng = VIOEngine(calib, cfg)
        state = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
        )
        poses, vels = [], []
        for j in range(1, len(seq["images"])):
            lo, hi = (j - 1) * 10, j * 10
            imu = np.zeros((16, 6), np.float32)
            imu[:10] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
            )
            dt = np.zeros(16, np.float32)
            dt[:10] = 1 / 200.0
            state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
            if bool(res.is_keyframe) and vi_ba:
                state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                      calib.cx, calib.cy)
            poses.append(np.asarray(state.p_wc))
            vels.append(np.asarray(state.v_w))
        gt = seq["gt_pos"][1:]
        gtv = seq["gt_vel"][1:]
        return (ate_rmse(np.array(poses), gt, align=False),
                float(np.linalg.norm(np.array(vels) - gtv, axis=-1).mean()))

    ate_plain, vel_plain = run(vi_ba=False)
    ate_vi, vel_vi = run(vi_ba=True)
    assert ate_vi < ate_plain, (ate_vi, ate_plain)
    assert vel_vi < 0.7 * vel_plain, (vel_vi, vel_plain)


def test_in_step_vi_ba_scan_mode():
    """cfg.backend.refine_in_step fuses the VI-BA into the jitted step
    (lax.cond on keyframe promotion), so the offline scan runner does full
    SLAM — including window refinement — as ONE device program. The GT-free
    scan must improve over the plain GT-free scan, like the host-loop path.
    """
    import dataclasses

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import (
        VIOEngine,
        make_sequence_inputs,
        run_sequence_scan,
    )
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=80, n_landmarks=300, seed=0)
    )
    calib = seq["calib"]
    inputs = make_sequence_inputs(seq, use_gt_scale=False)

    def run(in_step_ba):
        cfg = SystemConfig()
        if in_step_ba:
            cfg = dataclasses.replace(cfg, backend=dataclasses.replace(
                cfg.backend, vi_factors=True, refine_in_step=True))
        else:
            # Unsupervised open-loop baseline (round 5) — see the rationale
            # in test_vi_ba_improves_gt_free_engine_ate: the supervised
            # default open loop now rivals VI-BA on this gentle scenario;
            # the invariant pinned here is the in-step VI-factor chain.
            cfg = dataclasses.replace(cfg, engine=dataclasses.replace(
                cfg.engine, vi_align_bootstrap=False))
        eng = VIOEngine(calib, cfg)
        state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                               v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
        _, results = run_sequence_scan(eng, state, inputs)
        return np.asarray(results.p_wc)

    p_plain = run(False)
    p_ba = run(True)
    gt = seq["gt_pos"][1:]
    assert np.isfinite(p_ba).all()
    a_plain = ate_rmse(p_plain, gt, align=False)
    a_ba = ate_rmse(p_ba, gt, align=False)
    assert a_ba < a_plain, (a_ba, a_plain)


def test_vi_ba_tolerates_noisy_init(rng):
    R_cw, t_cw, v, p, X, fac, prob = _window(rng)
    W = R_cw.shape[0]
    # Pose + velocity + landmark noise on top of a 0.85 scale error.
    s = 0.85
    p0 = np.asarray(p[0])
    p_bad = p0 + s * (np.asarray(p) - p0)
    p_bad[1:] += rng.normal(scale=0.01, size=(W - 1, 3))
    X_bad = p0 + s * (np.asarray(X) - p0)
    X_bad += rng.normal(scale=0.02, size=X_bad.shape)
    v_bad = s * np.asarray(v) + rng.normal(scale=0.05, size=(W, 3))
    t_cw_bad = -np.einsum("wij,wj->wi", np.asarray(R_cw), p_bad)

    state0 = BAState(R=R_cw, t=jnp.asarray(t_cw_bad.astype(np.float32)),
                     X=jnp.asarray(X_bad.astype(np.float32)))
    (ref, v_ref), info = vi_bundle_adjust(
        state0, prob, jnp.asarray(v_bad.astype(np.float32)), fac,
        jnp.asarray(G), jnp.eye(3), iters=25,
    )
    p_ref = -jnp.einsum("wji,wj->wi", ref.R, ref.t)
    base_gt = np.linalg.norm(np.diff(np.asarray(p), axis=0), axis=-1)
    base_ref = np.linalg.norm(np.diff(np.asarray(p_ref), axis=0), axis=-1)
    ratio = base_ref / base_gt
    assert np.abs(ratio - 1.0).max() < 0.05, f"scale ratios {ratio}"
