"""Adversarial-vision validation: matchability + ATE head-to-head vs OpenCV.

Runs every hard regime (data/adversarial.py presets) through:
  - the TPU frontend detector families (corners, blobs, binary, guided), and
  - OpenCV reference algorithmics (SIFT / ORB with the reference's
    bidirectional 2-NN + ratio 0.8 + symmetry chain, eval/opencv_ref.py),
scoring every emitted match against the scene's exact GT correspondence,
then runs the full trajectory head-to-head (repo engine in reference-parity
GT-scale mode vs the OpenCV essential-matrix reference pipeline). Writes
MATCHABILITY.md. This is the SURVEY §7 "detector quality vs TPU-friendliness"
risk validation (VERDICT round-1 top item).
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from vislam_tpu.data.adversarial import make_adversarial_sequence, presets
    from vislam_tpu.eval import ate_rmse, run_vio_sequence
    from vislam_tpu.eval.matchability import (
        opencv_match_pairs, repo_match_pairs, score_pairs,
    )
    from vislam_tpu.eval.opencv_ref import reference_trajectory
    from vislam_tpu.utils.config import FrontendConfig

    n_frames = int(os.environ.get("MATCHABILITY_FRAMES", "16"))
    systems = [
        # Default frontend = shi_tomasi+sift, 2-level multi-scale since
        # round 3 (full fine budget + coarse extra capacity, K=768).
        ("tpu shi_tomasi+sift (default)", dict(fcfg=FrontendConfig())),
        ("tpu shi_tomasi single-scale", dict(
            fcfg=FrontendConfig(levels_used=1))),
        ("tpu dog+sift", dict(fcfg=FrontendConfig(detector="dog"))),
        ("tpu fast+brief (AKAZE-ish)", dict(fcfg=FrontendConfig(
            detector="fast", descriptor="brief"))),
        ("tpu dog+sift guided(30px)", dict(fcfg=FrontendConfig(detector="dog"),
                                           gate_px=30.0)),
        ("opencv SIFT (reference)", dict(kind="sift")),
        ("opencv ORB (reference)", dict(kind="orb")),
    ]

    rows = {}
    results = {}
    for regime, cfg in presets().items():
        cfg = dataclasses.replace(cfg, n_frames=n_frames)
        seq = make_adversarial_sequence(cfg)
        scene = seq["scene"]
        rows[regime] = []
        for name, kw in systems:
            t0 = time.time()
            if "kind" in kw:
                pairs = opencv_match_pairs(seq, kind=kw["kind"])
            else:
                pairs = repo_match_pairs(seq, kw["fcfg"],
                                         gate_px=kw.get("gate_px", 0.0))
            r = score_pairs(scene, pairs, name=name)
            rows[regime].append(r)
            results[f"{regime}/{name}"] = {
                "matches_per_pair": r.matches_per_pair,
                "inlier_rate": r.inlier_rate,
                "mean_px_err": r.mean_px_err,
            }
            print(f"{regime:11s} {name:28s} m/pair={r.matches_per_pair:7.1f} "
                  f"inl={100 * r.inlier_rate:5.1f}% ({time.time() - t0:.1f}s)")

    # --- Full-trajectory head-to-head (reference GT-scale parity mode).
    # EVERY regime, including repetitive (round-3: the hardest pair-level
    # regime turned out to be an end-to-end WIN — the engine's IMU-rotation-
    # compensated RANSAC rejects period-aliased matches, while the OpenCV
    # reference must recover rotation from them too).
    traj = {}
    for regime in ["natural", "illum", "blur", "repetitive", "occlusion",
                   "combined"]:
        cfg = dataclasses.replace(presets()[regime], n_frames=n_frames,
                                  gyro_noise=0.002, accel_noise=0.02)
        seq = make_adversarial_sequence(cfg)
        r_repo = run_vio_sequence(seq, gt_scale=True)
        # GT-FREE (IMU-scale + online VI-BA, the framework's default
        # GT-free mode) on the same frames — the round-4 VERDICT demanded
        # a GT-free repetitive row in particular (the aliasing regime).
        r_free = run_vio_sequence(seq, gt_scale=False, online_ba=True,
                                  vi_factors=True)
        ate_cv = {}
        for kind in ("sift", "orb"):
            p_cv = reference_trajectory(seq, kind=kind)
            ate_cv[kind] = float(
                ate_rmse(p_cv[1:], seq["gt_pos"][1:], align=False))
        traj[regime] = {"ate_tpu": r_repo["ate"],
                        "ate_tpu_gtfree": r_free["ate"],
                        "ate_opencv_sift": ate_cv["sift"],
                        "ate_opencv_orb": ate_cv["orb"]}
        print(f"traj {regime:11s} ATE tpu={r_repo['ate']:.3f} "
              f"gt-free={r_free['ate']:.3f} "
              f"opencv-sift={ate_cv['sift']:.3f} "
              f"opencv-orb={ate_cv['orb']:.3f}")

    with open("/root/repo/MATCHABILITY.md", "w") as f:
        f.write("# Adversarial-vision validation (hard synthetic imagery)\n\n")
        f.write(
            "Head-to-head on IDENTICAL frames: TPU frontend vs OpenCV\n"
            "reference algorithmics (the reference's own library + exact\n"
            "matcher semantics, eval/opencv_ref.py). Scenes are raycast\n"
            "textured rooms with exact GT correspondence (data/adversarial.py);\n"
            "an emitted match is an inlier iff it lands within 4 px of the\n"
            "true-geometry reprojection and on a static, unoccluded surface.\n"
            f"{n_frames} frames per regime, 752x480, consecutive pairs.\n\n"
            "Regimes: natural (dense texture), illum (exposure x0.65-1.35 +\n"
            "moving shading), blur (30 ms exposure motion blur), repetitive\n"
            "(brick walls: near-identical local appearance), occlusion (4\n"
            "independently moving textured boards), combined (all of it).\n\n"
        )
        for regime, rs in rows.items():
            f.write(f"## {regime}\n\n")
            f.write("| frontend | matches/pair | inliers/pair | inlier rate | px err (GT-valid) |\n")
            f.write("|---|---|---|---|---|\n")
            for r in rs:
                f.write(r.row() + "\n")
            f.write("\n")
        f.write("## Full-trajectory ATE (reference GT-scale parity mode)\n\n")
        f.write("TPU engine (shi_tomasi+sift default, IMU rotation + essential\n")
        f.write("RANSAC) vs the OpenCV reference pipeline (SIFT/ORB +\n")
        f.write("bidirectional 2-NN/ratio/symmetry + findEssentialMat/\n")
        f.write("recoverPose, GT-scaled). All regimes, repetitive included:\n")
        f.write("the pair-level matchability deficit there does NOT reach the\n")
        f.write("trajectory — rotation comes from the IMU and the rotation-\n")
        f.write("compensated translation RANSAC rejects period-aliased match\n")
        f.write("sets (plus the round-3 direction-disagreement rescue for the\n")
        f.write("frames where aliasing survives RANSAC).\n\n")
        f.write("| regime | ATE tpu (m) | ATE tpu GT-FREE (m) | "
                "ATE opencv-sift (m) | ATE opencv-orb (m) |\n"
                "|---|---|---|---|---|\n")
        for regime, d in traj.items():
            f.write(f"| {regime} | {d['ate_tpu']:.3f} | "
                    f"{d.get('ate_tpu_gtfree', float('nan')):.3f} | "
                    f"{d['ate_opencv_sift']:.3f} | "
                    f"{d['ate_opencv_orb']:.3f} |\n")
        f.write("\nGenerated by scripts/eval_matchability.py\n")

    print(json.dumps({"pairs": results, "traj": traj}, indent=1, default=float))


if __name__ == "__main__":
    main()
