"""GT-free aliasing defense: measure the SPLIT-DRAW disagreement signal.

Round-3 shipped an aliasing rescue gated to GT-scale mode only: its trigger
and acceptance both compare the solved translation direction to the
IMU-PREDICTED direction, and in IMU-scale (GT-free) mode the IMU prediction
is simultaneously the arbiter and the monocular scale source — rescuing
toward it closes a feedback loop (measured: aggr3 VI-BA 0.30 -> 1.13).

VERDICT r04 #6 demands a SCALE-DECOUPLED arbiter. Candidate: period-aliased
match sets are epipolar-consistent with SEVERAL translation modes of
comparable support, so two RANSAC solves over DISJOINT hypothesis draws can
land on different modes — |cos(t_a, t_b)| between two independent draws is
a purely-visual multi-modality detector that never consults the IMU
direction. Healthy scenes have one dominant mode: the draws agree.

This script measures that signal's separation: per consecutive frame pair
of each adversarial regime, two disjoint-key RANSAC solves -> |cos| stats,
plus the same for the ROTATION-GATED match set (the rescue's re-match) —
the acceptance criterion needs gated-solve self-consistency too.

Usage: python scripts/eval_aliasing_gtfree.py
"""

from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp


def pair_signals(seq, fcfg, gate_px: float = 60.0, stride: int = 1):
    """Per consecutive pair: (cos_split_ungated, cos_split_gated,
    inl_ungated, inl_gated, cos_ungated_vs_gt)."""
    from vislam_tpu.calib.camera_model import unproject_pixels
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.frontend.pose import ransac_translation

    calib = seq["calib"]
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    n = len(seq["images"])
    feats = [extract_features(jnp.asarray(im, jnp.float32), fcfg)
             for im in seq["images"]]

    from scipy.spatial.transform import Rotation as Rsp

    R_wb = Rsp.from_quat(np.roll(np.asarray(seq["gt_quat"]), -1, axis=1)
                         ).as_matrix()
    R_bc = np.asarray(calib.T_body_cam[:3, :3], np.float32)
    out = []
    for j in range(stride, n):
        fi, fj = feats[j - stride], feats[j]
        R_wc_i = R_wb[j - stride] @ R_bc
        R_wc_j = R_wb[j] @ R_bc
        R_ji = jnp.asarray((R_wc_j.T @ R_wc_i).astype(np.float32))

        def solve_pair(m, key):
            uv_i = fi.uv
            uv_j = jnp.take(fj.uv, m.idx_b, axis=0)
            ri = unproject_pixels(uv_i, fx, fy, cx, cy)
            rj = unproject_pixels(uv_j, fx, fy, cx, cy)
            ri = ri / jnp.linalg.norm(ri, axis=-1, keepdims=True)
            rj = rj / jnp.linalg.norm(rj, axis=-1, keepdims=True)
            ea = ransac_translation(ri, rj, R_ji, m.mask,
                                    jax.random.fold_in(key, 0))
            eb = ransac_translation(ri, rj, R_ji, m.mask,
                                    jax.random.fold_in(key, 1))
            cos_ab = float(jnp.abs(jnp.dot(ea.t_dir, eb.t_dir)))
            return cos_ab, int(ea.num_inliers), np.asarray(ea.t_dir)

        m_u = match_descriptors(fi.desc, fi.mask, fj.desc, fj.mask,
                                uv_a=fi.uv, ratio=fcfg.ratio_thresh,
                                mutual=fcfg.mutual_check)
        key = jax.random.PRNGKey(j)
        cos_u, inl_u, t_u = solve_pair(m_u, key)

        # Rotation-gated re-match (the rescue's candidate set) — the gate
        # uses ONLY the relative rotation (infinite-depth homography):
        # scale-free by construction.
        x = (fi.uv[:, 0] - cx) / fx
        y = (fi.uv[:, 1] - cy) / fy
        rk = jnp.stack([x, y, jnp.ones_like(x)], -1)
        wrp = rk @ R_ji.T
        wz = jnp.where(jnp.abs(wrp[:, 2]) > 1e-6, wrp[:, 2], 1e-6)
        uv_pred = jnp.stack([wrp[:, 0] / wz * fx + cx,
                             wrp[:, 1] / wz * fy + cy], -1)
        m_g = match_descriptors(fi.desc, fi.mask, fj.desc, fj.mask,
                                uv_a=fi.uv, ratio=fcfg.ratio_thresh,
                                mutual=fcfg.mutual_check,
                                uv_pred=uv_pred, uv_b=fj.uv,
                                gate_radius=gate_px)
        cos_g, inl_g, t_g = solve_pair(m_g, jax.random.fold_in(key, 99))

        # GT translation direction in frame-j coords (diagnostic only).
        dp = seq["gt_pos"][j] - seq["gt_pos"][j - stride]
        t_gt = -(R_wc_j.T @ dp)
        nrm = np.linalg.norm(t_gt)
        cos_gt = (float(np.abs(np.dot(t_u, t_gt / nrm))) if nrm > 1e-6
                  else float("nan"))
        out.append((cos_u, cos_g, inl_u, inl_g, cos_gt))
    return out


def main():
    from vislam_tpu.data.adversarial import make_adversarial_sequence, presets
    from vislam_tpu.utils.config import FrontendConfig

    n_frames = int(os.environ.get("ALIAS_FRAMES", "12"))
    fcfg = FrontendConfig()
    print(f"{'regime':12s} {'cosAB-ungated p10/med':>22} "
          f"{'cosAB-gated p10/med':>20} {'cos-vs-GT med':>14} "
          f"{'inl u/g':>10}")
    for regime, stride in [("natural", 1), ("natural", 4), ("blur", 4),
                           ("repetitive", 1), ("repetitive", 2),
                           ("repetitive", 4), ("repetitive", 6),
                           ("occlusion", 4), ("combined", 4)]:
        cfg = dataclasses.replace(presets()[regime], n_frames=n_frames)
        seq = make_adversarial_sequence(cfg)
        sig = pair_signals(seq, fcfg, stride=stride)
        cu = np.array([s[0] for s in sig])
        cg = np.array([s[1] for s in sig])
        cgt = np.array([s[4] for s in sig])
        iu = np.array([s[2] for s in sig])
        ig = np.array([s[3] for s in sig])
        print(f"{regime:9s}s{stride} {np.percentile(cu,10):>10.3f}/{np.median(cu):.3f}"
              f" {np.percentile(cg,10):>12.3f}/{np.median(cg):.3f}"
              f" {np.nanmedian(cgt):>13.3f}"
              f" {np.median(iu):>5.0f}/{np.median(ig):.0f}")


if __name__ == "__main__":
    main()
