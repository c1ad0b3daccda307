"""Gauge-ensemble harness: GT-free VI-BA across the 5 BENCH_NOTES scenarios.

The round-2/3 verdict demands the DEFAULT online gauge never lose to
open-loop on any scenario. This script measures open-loop vs the configured
gauges on: gentle motion (seeds 0, 2), translationally aggressive motion
(seeds 1, 3), and the drifting-IMU-bias run — printing an ATE matrix.

Usage: python scripts/eval_gauge_ensemble.py [gauge ...]   (default: all)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def scenarios():
    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence

    bias0_g = (0.010, -0.008, 0.006)
    drift_g = (0.020, 0.015, -0.012)
    bias0_a = (0.05, -0.04, 0.03)
    drift_a = (0.05, 0.04, -0.03)
    return {
        "gentle0": make_synthetic_sequence(SyntheticConfig(
            n_frames=80, n_landmarks=300, seed=0)),
        "gentle2": make_synthetic_sequence(SyntheticConfig(
            n_frames=80, n_landmarks=300, seed=2)),
        "aggr1": make_synthetic_sequence(SyntheticConfig(
            n_frames=60, n_landmarks=350, seed=1,
            trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3))),
        "aggr3": make_synthetic_sequence(SyntheticConfig(
            n_frames=60, n_landmarks=350, seed=3,
            trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3))),
        "drift-bias": make_synthetic_sequence(SyntheticConfig(
            n_frames=80, n_landmarks=300, seed=1,
            gyro_bias=bias0_g, gyro_bias_drift=drift_g,
            accel_bias=bias0_a, accel_bias_drift=drift_a)),
    }


def run(seq, gauge=None, vi_ba=True, extra_backend=None):
    import dataclasses

    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    calib = seq["calib"]
    cfg = SystemConfig()
    be_kw = {}
    if vi_ba:
        be_kw["vi_factors"] = True
    if gauge:
        be_kw["online_gauge"] = gauge
    if extra_backend:
        be_kw.update(extra_backend)
    if be_kw:
        cfg = dataclasses.replace(
            cfg, backend=dataclasses.replace(cfg.backend, **be_kw))
    eng = VIOEngine(calib, cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    n = len(seq["images"])
    poses = []
    for j in range(1, n):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
        if bool(res.is_keyframe) and vi_ba:
            state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                  calib.cx, calib.cy)
        poses.append(np.asarray(state.p_wc))
    return float(ate_rmse(np.array(poses), seq["gt_pos"][1:n], align=False))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    gauges = sys.argv[1:] or ["marg", "ends"]
    seqs = scenarios()
    out = {}
    for name, seq in seqs.items():
        row = {"open_loop": run(seq, vi_ba=False)}
        for g in gauges:
            row[g] = run(seq, gauge=g)
        out[name] = row
        print(name, json.dumps(row, default=lambda x: round(float(x), 3)))
    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
