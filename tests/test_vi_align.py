"""Visual-inertial alignment: recover scale, gravity, velocities from
up-to-scale vision + exact preintegration on synthetic data."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.inertial import preintegrate
from vislam_tpu.inertial.vi_align import refine_gravity, vi_align


def _window(seq, cfg, ks):
    """Preintegrate between chosen keyframe indices ks (camera frames)."""
    R_wb = np.stack([
        Rsp.from_quat(np.roll(seq["gt_quat"][k], -1)).as_matrix() for k in ks
    ]).astype(np.float32)
    dv, dp, dt = [], [], []
    for a, b in zip(ks[:-1], ks[1:]):
        lo, hi = a * 10, b * 10
        g = jnp.asarray(seq["imu_gyro"][lo:hi])
        acc = jnp.asarray(seq["imu_accel"][lo:hi])
        d = jnp.full((hi - lo,), 1 / 200.0, jnp.float32)
        pre = preintegrate(g, acc, d)
        dv.append(np.asarray(pre.dv))
        dp.append(np.asarray(pre.dp))
        dt.append(float(pre.dt))
    return R_wb, np.array(dv), np.array(dp), np.array(dt)


def test_alignment_recovers_scale_and_gravity():
    cfg = SyntheticConfig(n_frames=60, n_landmarks=10, seed=2)
    seq = make_synthetic_sequence(cfg)
    ks = list(range(0, 56, 5))  # 12 keyframes
    R_wb, dv, dp, dt = _window(seq, cfg, ks)

    true_scale = 3.7
    pbar = np.stack([seq["gt_pos"][k] for k in ks]) / true_scale

    out = vi_align(
        jnp.asarray(R_wb), jnp.asarray(pbar, jnp.float32),
        jnp.asarray(dv), jnp.asarray(dp), jnp.asarray(dt, jnp.float32),
    )
    s = float(out.scale)
    g = np.asarray(out.gravity)
    assert abs(s - true_scale) / true_scale < 0.03, s
    # Gravity direction within 2 degrees of -z, magnitude within 3%.
    gn = np.linalg.norm(g)
    assert abs(gn - cfg.gravity) / cfg.gravity < 0.03, gn
    cos = -g[2] / gn
    assert cos > np.cos(np.radians(2.0)), g

    # Velocities match GT.
    v_gt = np.stack([seq["gt_vel"][k] for k in ks])
    err = np.linalg.norm(np.asarray(out.velocities) - v_gt, axis=-1)
    assert err.max() < 0.08, err.max()

    out2 = refine_gravity(out, cfg.gravity)
    assert abs(np.linalg.norm(np.asarray(out2.gravity)) - cfg.gravity) < 1e-5


def test_alignment_with_noisy_vision():
    cfg = SyntheticConfig(n_frames=60, n_landmarks=10, seed=3)
    seq = make_synthetic_sequence(cfg)
    ks = list(range(0, 56, 5))
    R_wb, dv, dp, dt = _window(seq, cfg, ks)
    rng = np.random.default_rng(0)
    true_scale = 2.0
    pbar = np.stack([seq["gt_pos"][k] for k in ks]) / true_scale
    pbar = pbar + 0.002 * rng.standard_normal(pbar.shape)  # ~4 mm vision noise

    out = vi_align(
        jnp.asarray(R_wb), jnp.asarray(pbar, jnp.float32),
        jnp.asarray(dv), jnp.asarray(dp), jnp.asarray(dt, jnp.float32),
    )
    assert abs(float(out.scale) - true_scale) / true_scale < 0.10, float(out.scale)
