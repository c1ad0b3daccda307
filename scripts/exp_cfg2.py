"""Config-2 (GT-free IMU scale) experiment: why does VI-BA shrink scale?

Varies gauge / velocity-feedback cap / IMU-factor weights and reports
ATE + path-scale ratio for each.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from scripts.eval_configs import run_vio
    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=80, n_landmarks=300, seed=0)
    )
    gl = None

    def run(tag, **bk):
        nonlocal gl
        c = SystemConfig()
        cfg = dataclasses.replace(
            c, backend=dataclasses.replace(c.backend, **bk)
        )
        r = run_vio(seq, cfg=cfg, gt_scale=False, vi_ba=True)
        el = np.linalg.norm(np.diff(r["poses"], axis=0), axis=1).sum()
        if gl is None:
            gl = np.linalg.norm(np.diff(r["gt"], axis=0), axis=1).sum()
        print(json.dumps({
            "tag": tag,
            "ate": round(ate_rmse(r["poses"], r["gt"], align=False), 4),
            "scale": round(float(el / gl), 4),
        }))

    run("baseline_ends")
    run("gauge_oldest", online_gauge="oldest2")
    run("vel_cap_0.05", max_anchor_vel=0.05)
    run("vel_cap_0.5", max_anchor_vel=0.5)
    run("w_vel_x4", vi_w_vel=SystemConfig().backend.vi_w_vel * 4)
    run("w_pos_x4", vi_w_pos=SystemConfig().backend.vi_w_pos * 4)
    run("w_pos_x0.25", vi_w_pos=SystemConfig().backend.vi_w_pos * 0.25)


if __name__ == "__main__":
    main()
