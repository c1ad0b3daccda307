"""Sweep epipolar-RANSAC threshold/hypotheses -> ATE (default tuning)."""
import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine
from vislam_tpu.eval import ate_rmse
from vislam_tpu.utils.config import SystemConfig


def run(thresh, hyps, seed):
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=40, n_landmarks=300,
                                                  seed=seed))
    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg, backend=dataclasses.replace(cfg.backend, ransac_thresh=thresh,
                                         ransac_hyps=hyps)
    )
    eng = VIOEngine(seq["calib"], cfg)
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                           v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    last_kf = 0
    poses = []
    for j in range(1, 40):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi],
                                   seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
        poses.append(np.asarray(res.p_wc))
    return ate_rmse(np.array(poses), seq["gt_pos"][1:40], align=False)


for thresh in (0.005, 0.01, 0.02):
    for hyps in (512, 1024):
        ates = [run(thresh, hyps, s) for s in (0, 7)]
        print(f"thresh={thresh} hyps={hyps}: ATE={np.mean(ates):.4f} "
              f"({ates[0]:.3f}/{ates[1]:.3f})", flush=True)
