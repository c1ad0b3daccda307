"""Shared host-loop VIO runner for evaluation harnesses and tests.

One canonical way to drive VIOEngine over an in-memory sequence dict (the
schema produced by data/synthetic.py and data/adversarial.py), replacing the
hand-rolled per-test loops. Mirrors the reference main loop
(/root/reference/src/main_vi_slam.cpp:114-355): per frame, gather the IMU
window, inject the GT step length when running the reference's GT-scale
parity mode (setGtRes, src/VISystem.cpp:415-419), step, optionally refine.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def run_vio_sequence(
    seq: Dict,
    cfg=None,
    gt_scale: bool = True,
    online_ba: bool = False,
    vi_factors: Optional[bool] = None,
    init_bias: bool = False,
    n_frames: Optional[int] = None,
) -> Dict:
    """Run the engine over seq; returns dict with poses (N-1, 3), gt, ate.

    gt_scale=True is the reference parity mode (translation scaled by the GT
    step norm); gt_scale=False uses IMU (visual-inertial) scale.
    online_ba runs refine_window after each keyframe promotion (host loop).
    vi_factors overrides cfg.backend.vi_factors (None = leave as configured,
    defaulting to the IMU-scale mode's value).
    """
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval.metrics import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    calib = seq["calib"]
    cfg = cfg or SystemConfig()
    if vi_factors is not None:
        cfg = dataclasses.replace(
            cfg, backend=dataclasses.replace(cfg.backend, vi_factors=vi_factors)
        )
    eng = VIOEngine(calib, cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    if init_bias:
        import jax.numpy as jnp

        state = state._replace(
            bias_g=jnp.zeros(3, jnp.float32), bias_a=jnp.zeros(3, jnp.float32)
        )

    n = n_frames or len(seq["images"])
    spf = int(round((calib.rate_imu_hz or 200.0) / (calib.rate_cam_hz or 20.0)))
    pad = cfg.engine.imu_window
    dt_imu = 1.0 / (calib.rate_imu_hz or 200.0)
    last_kf = 0
    poses = []
    for j in range(1, n):
        lo, hi = (j - 1) * spf, j * spf
        imu = np.zeros((pad, 6), np.float32)
        if len(seq["imu_gyro"]) >= hi:
            imu[:spf] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
            )
        dt = np.zeros(pad, np.float32)
        dt[:spf] = dt_imu
        gt_norm = (
            float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
            if gt_scale else -1.0
        )
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
            if online_ba:
                state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                      calib.cx, calib.cy)
        poses.append(np.asarray(state.p_wc))
    poses = np.array(poses)
    gt = seq["gt_pos"][1:n]
    return {
        "poses": poses,
        "gt": gt,
        "ate": float(ate_rmse(poses, gt, align=False)),
        "state": state,
    }
