"""End-to-end frontend decision: shi_tomasi+sift (default) vs fast+brief
(VERDICT r04 #7).

MATCHABILITY.md shows fast+brief WINNING pair-level px-error in nearly
every regime (0.72-0.93 vs 1.4-2.0) and repetitive inlier rate (87.9% vs
74.5%) at lower compute — but nobody had run it through the pinned ATE
configs. The reference makes detector choice a first-class config
(/root/reference/src/Camera.cpp:94-138); the default here must be decided
by trajectory-level data, not pair-level proxies.

Usage: python scripts/eval_frontend_choice.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import numpy as np
    from eval_configs import run_vio

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.config import SystemConfig

    def fe_cfg(detector, descriptor):
        c = SystemConfig()
        return dataclasses.replace(
            c, frontend=dataclasses.replace(
                c.frontend, detector=detector, descriptor=descriptor))

    seq1 = make_synthetic_sequence(
        SyntheticConfig(n_frames=80, n_landmarks=300, seed=0))
    seq3 = make_synthetic_sequence(SyntheticConfig(
        n_frames=60, n_landmarks=350, seed=1,
        trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3)))

    rows = {}
    for name, det, desc in (("shi_tomasi+sift", "shi_tomasi", "sift"),
                            ("fast+brief", "fast", "brief")):
        cfg = fe_cfg(det, desc)
        r1 = run_vio(seq1, cfg=cfg, gt_scale=True)
        r2o = run_vio(seq1, cfg=cfg, gt_scale=False)
        r2b = run_vio(seq1, cfg=cfg, gt_scale=False, vi_ba=True)
        r3 = run_vio(seq3, cfg=cfg, gt_scale=True)
        r3o = run_vio(seq3, cfg=cfg, gt_scale=False)
        r3b = run_vio(seq3, cfg=cfg, gt_scale=False, vi_ba=True)
        rows[name] = dict(
            cfg1=ate_rmse(r1["poses"], r1["gt"], align=False),
            cfg2_open=ate_rmse(r2o["poses"], r2o["gt"], align=False),
            cfg2_viba=ate_rmse(r2b["poses"], r2b["gt"], align=False),
            cfg3_gt=ate_rmse(r3["poses"], r3["gt"], align=False),
            cfg3b_open=ate_rmse(r3o["poses"], r3o["gt"], align=False),
            cfg3b_viba=ate_rmse(r3b["poses"], r3b["gt"], align=False),
        )
        print(name, {k: round(v, 3) for k, v in rows[name].items()},
              flush=True)

    keys = ["cfg1", "cfg2_open", "cfg2_viba", "cfg3_gt", "cfg3b_open",
            "cfg3b_viba"]
    print(f"\n{'config':12s} {'shi_tomasi+sift':>16s} {'fast+brief':>12s}")
    for k in keys:
        print(f"{k:12s} {rows['shi_tomasi+sift'][k]:>16.3f} "
              f"{rows['fast+brief'][k]:>12.3f}")
    m_s = np.mean([rows["shi_tomasi+sift"][k] for k in keys])
    m_f = np.mean([rows["fast+brief"][k] for k in keys])
    print(f"{'MEAN':12s} {m_s:>16.3f} {m_f:>12.3f}")


if __name__ == "__main__":
    main()
