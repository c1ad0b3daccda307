"""Measure VI-BA effect on the GT-free (IMU-scale) config #2 analog.

Compares: no BA / visual-inertial BA, on the standard synthetic oracle and
on the aggressive-motion regime. Prints ATE, final scale ratio, and mean
velocity error.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import dataclasses

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    def run(seq, vi_ba):
        calib = seq["calib"]
        cfg = SystemConfig()
        if vi_ba:
            cfg = dataclasses.replace(
                cfg, backend=dataclasses.replace(cfg.backend, vi_factors=True)
            )
        eng = VIOEngine(calib, cfg)
        state = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
        )
        n = len(seq["images"])
        poses, vels = [], []
        for j in range(1, n):
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
        poses = np.array(poses)
        vels = np.array(vels)
        gt = seq["gt_pos"][1:n]
        gtv = seq["gt_vel"][1:n]
        el = np.linalg.norm(np.diff(poses, axis=0), axis=1).sum()
        gl = np.linalg.norm(np.diff(gt, axis=0), axis=1).sum()
        return {
            "ate": ate_rmse(poses, gt, align=False),
            "scale_ratio": float(el / gl),
            "vel_err_mean": float(np.linalg.norm(vels - gtv, axis=-1).mean()),
        }

    out = {}
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=80, n_landmarks=300, seed=0))
    out["std_noBA"] = run(seq, vi_ba=False)
    out["std_viBA"] = run(seq, vi_ba=True)
    seq3 = make_synthetic_sequence(SyntheticConfig(
        n_frames=60, n_landmarks=350, seed=1,
        trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3),
    ))
    out["agg_noBA"] = run(seq3, vi_ba=False)
    out["agg_viBA"] = run(seq3, vi_ba=True)
    print(json.dumps(out, indent=2, default=float))


if __name__ == "__main__":
    main()
