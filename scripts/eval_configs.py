"""Run the 5 BASELINE.json evaluation configs (synthetic-oracle analogs) and
write EVAL.md.

Real EUROC/KITTI data is unavailable in this environment (zero egress), so
each config runs on the synthetic oracle generator in the corresponding
regime; the harness accepts a dataset path drop-in once real data exists
(the CLI already reads the real formats).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json

import numpy as np


def run_vio(seq, cfg=None, gt_scale=True, ba=False, vi_ba=False,
            photometric=False, vision_rotation=False, loop_correct=False):
    import dataclasses

    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.utils.config import SystemConfig
    from vislam_tpu.backend.trajectory_opt import (
        correct_trajectory, record_from_feat,
    )

    calib = seq["calib"]
    c = cfg or SystemConfig()
    eng_cfg = dataclasses.replace(
        c, engine=dataclasses.replace(
            c.engine, vision_rotation=vision_rotation,
            photometric_refine=photometric,
        )
    )
    if vi_ba:
        ba = True
        eng_cfg = dataclasses.replace(
            eng_cfg,
            backend=dataclasses.replace(eng_cfg.backend, vi_factors=True),
        )
    eng = VIOEngine(calib, eng_cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    n = len(seq["images"])
    last_kf = 0
    poses = []
    archive = []
    t0 = time.perf_counter()
    for j in range(1, n):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        if len(seq["imu_gyro"]) >= hi:
            imu[:10] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
            )
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        gt_norm = (
            float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
            if gt_scale else -1.0
        )
        state, res = eng.step(state, seq["images"][j], imu, dt, gt_norm)
        if bool(res.is_keyframe):
            last_kf = j
            if ba:
                state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                      calib.cx, calib.cy)
            if loop_correct:
                archive.append(record_from_feat(
                    j, state.kf_R_wc, state.kf_p_wc, state.kf_feat))
        poses.append(np.asarray(state.p_wc))
    wall = time.perf_counter() - t0
    poses = np.array(poses)
    out = {"poses": poses, "gt": seq["gt_pos"][1:n], "fps": (n - 1) / wall}
    if loop_correct and len(archive) > 10:
        p_corr, _, info = correct_trajectory(
            archive, calib.fx, calib.fy, calib.cx, calib.cy,
            min_separation=10, sim_thresh=0.80, min_inliers=25,
        )
        out["loops"] = info["loops"]
        kf_gt = np.array([seq["gt_pos"][k.frame_index] for k in archive])
        out["kf_err_before"] = float(np.linalg.norm(
            np.stack([k.p_wc for k in archive]) - kf_gt, axis=-1).max())
        out["kf_err_after"] = float(np.linalg.norm(p_corr - kf_gt, axis=-1).max())
    return out


HISTORY_PATH = "/root/repo/EVAL_HISTORY.json"

# LONGITUDINAL PINNING (round-3, VERDICT weak #6): every config id below is
# frozen — seeds, frame counts, landmark counts, and motion amplitudes must
# NOT change between rounds, so EVAL.md rows stay comparable. If a config
# must change, give it a NEW id and keep the old one. Results are appended
# to EVAL_HISTORY.json per round and EVAL.md shows the previous round's
# value next to each current one.
PINNED = {
    "1": "seed 0, 80 frames, 300 landmarks",
    "2": "seed 0, 80 frames, 300 landmarks (same sequence as #1)",
    "3": "seed 1, 60 frames, 350 landmarks, trans (2.0,1.4,0.7), rot (0.12,0.15,0.3)",
    "4": "seed 21, 86 frames, 300 landmarks",
    "5": "seeds 0-7, 24 frames, 250 landmarks",
    "6": "seed 42, 500 frames, 400 landmarks (long run: GT-free VI-BA + "
         "reloc + checkpoint/resume + loop correction in one run)",
    "2c": "seed 0, 60 frames, 300 landmarks, v0=0 COLD start, GT-free "
          "VI-BA (two-phase init + retroactive bootstrap smoothing)",
}


def run_cold(seq):
    """Config 2c (round 5): the cold-start path under the DEFAULT GT-free
    mode — the round-4 system's worst path (1.07+ m), now two-phase
    initialized (engine/refine.py) and retroactively smoothed
    (eval/smooth.py). Reports live and smoothed ATE."""
    import dataclasses

    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse, smooth_bootstrap_prefix
    from vislam_tpu.utils.config import SystemConfig

    calib = seq["calib"]
    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg, backend=dataclasses.replace(cfg.backend, vi_factors=True))
    eng = VIOEngine(calib, cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=np.zeros(3), p_w0=seq["gt_pos"][0])
    n = len(seq["images"])
    poses, shadows, applies = [], [], []
    for j in range(1, n):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
        if bool(res.is_keyframe):
            state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                  calib.cx, calib.cy)
        poses.append(np.asarray(state.p_wc))
        shadows.append(np.asarray(state.shadow_p_wc))
        applies.append(int(state.bootstrap_applies))
    poses = np.array(poses)
    gt = seq["gt_pos"][1:n]
    sm = smooth_bootstrap_prefix(
        poses, np.array(shadows), np.array(applies),
        np.asarray(state.origin_p_wc), np.asarray(state.shadow_origin_p))
    from vislam_tpu.eval import ate_rmse as _ate
    return {
        "ate_live": _ate(poses, gt, align=False),
        "ate_smoothed": _ate(sm, gt, align=False),
        "n_applies": int(applies[-1]) if applies else 0,
        "aligned": bool(state.vi_aligned),
    }


def run_long(seq):
    """Config 6 (round 5, VERDICT #6): one LONG run (500 frames, ~120+
    keyframes — the /root/reference calibrationKitti.xml regime is seq 00's
    4,541 frames; this is the synthetic-oracle analog) exercising the
    flagship GT-free VI-BA mode, keyframe archiving, relocalization
    machinery, checkpoint/save + resume (bitwise state round-trip at frame
    250), and end-of-run loop correction — while measuring drift GROWTH by
    segment and the pose-rotation orthogonality error (CLAUDE.md rule 5:
    unchecked, composition error doubles per keyframe and diverges at
    ~25-45 kfs; 120+ keyframes is far past that cliff)."""
    import dataclasses
    import tempfile

    import jax.numpy as jnp

    from vislam_tpu.backend.trajectory_opt import (
        correct_trajectory,
        record_from_feat,
    )
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse
    from vislam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    from vislam_tpu.utils.config import SystemConfig

    calib = seq["calib"]
    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg, backend=dataclasses.replace(cfg.backend, vi_factors=True))
    eng = VIOEngine(calib, cfg)
    state = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    n = len(seq["images"])
    poses = []
    archive = []
    ortho_err_max = 0.0
    ckpt_resumed = False
    t0 = time.perf_counter()
    for j in range(1, n):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        state, res = eng.step(state, seq["images"][j], imu, dt, -1.0)
        if bool(res.is_keyframe):
            state = refine_window(state, eng.cfg, calib.fx, calib.fy,
                                  calib.cx, calib.cy)
            archive.append(record_from_feat(
                j, state.kf_R_wc, state.kf_p_wc, state.kf_feat))
            R = np.asarray(state.kf_R_wc)
            ortho_err_max = max(ortho_err_max, float(np.abs(
                R @ R.T - np.eye(3)).max()))
        if j == 250:
            # Checkpoint round-trip mid-run: the resumed state must be
            # bitwise identical (deterministic replay depends on it).
            import jax as _jax
            with tempfile.TemporaryDirectory() as td:
                p = os.path.join(td, "ck.npz")
                save_checkpoint(p, state, j, {"last_kf": j})
                state2, fidx = load_checkpoint(p)
                same = all(
                    np.array_equal(np.asarray(a), np.asarray(b))
                    for a, b in zip(_jax.tree.leaves(state),
                                    _jax.tree.leaves(state2)))
                ckpt_resumed = bool(same and fidx == j)
                state = state2
        poses.append(np.asarray(state.p_wc))
    wall = time.perf_counter() - t0
    poses = np.array(poses)
    gt = seq["gt_pos"][1:n]
    out = {
        "ate_full": ate_rmse(poses, gt, align=False),
        "ate_f1_100": ate_rmse(poses[:100], gt[:100], align=False),
        "ate_f100_300": ate_rmse(poses[100:300], gt[100:300], align=False),
        "ate_f300_500": ate_rmse(poses[300:], gt[300:], align=False),
        "n_keyframes": len(archive),
        "ortho_err_max": ortho_err_max,
        "ckpt_resume_bitwise": ckpt_resumed,
        "fps_cpu_harness": (n - 1) / wall,
    }
    if len(archive) > 10:
        p_corr, _, info = correct_trajectory(
            archive, calib.fx, calib.fy, calib.cx, calib.cy,
            min_separation=10, sim_thresh=0.80, min_inliers=25)
        kf_gt = np.array([seq["gt_pos"][k.frame_index] for k in archive])
        out["n_loops"] = len(info["loops"])
        out["kf_maxerr_before"] = float(np.linalg.norm(
            np.stack([k.p_wc for k in archive]) - kf_gt, axis=-1).max())
        out["kf_maxerr_after"] = float(np.linalg.norm(
            p_corr - kf_gt, axis=-1).max())
    return out


def _load_history():
    if os.path.exists(HISTORY_PATH):
        with open(HISTORY_PATH) as fh:
            return json.load(fh)
    return {}


def _fmt_prev(prev, key, scale=1.0):
    if prev is None or key not in prev:
        return "—"
    return f"{float(prev[key]) * scale:.3f}"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.eval import ate_rmse

    history = _load_history()
    this_hint = os.environ.get("EVAL_ROUND")
    # Re-runs within a round must compare against the round BEFORE, not the
    # half-written entry of the current one.
    rounds = sorted(k for k in history.keys() if k != this_hint)
    prev_label = rounds[-1] if rounds else None
    this_label = os.environ.get(
        "EVAL_ROUND",
        f"r{(int(prev_label[1:]) + 1) if prev_label else 1:02d}")

    results = {}

    # 1. Vision-dominant monocular odometry, GT scale (config #1 analog).
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=80, n_landmarks=300, seed=0))
    r = run_vio(seq, gt_scale=True)
    results["1_mono_gt_scale"] = {
        "ate": ate_rmse(r["poses"], r["gt"], align=False), "fps_cpu_harness": r["fps"],
    }

    # 2. Full visual-inertial, IMU scale (config #2 analog) — open-loop and
    # with in-loop visual-inertial BA (preintegrated-IMU window factors).
    r = run_vio(seq, gt_scale=False)
    el = np.linalg.norm(np.diff(r["poses"], axis=0), axis=1).sum()
    gl = np.linalg.norm(np.diff(r["gt"], axis=0), axis=1).sum()
    r_vb = run_vio(seq, gt_scale=False, vi_ba=True)
    el_vb = np.linalg.norm(np.diff(r_vb["poses"], axis=0), axis=1).sum()
    # Unsupervised open loop (shadow-chain supervision off) — the r03
    # baseline semantics; the default open loop is SUPERVISED since r04
    # (VERDICT r04 #2: the rows must name which system they describe).
    import dataclasses as _dc0

    from vislam_tpu.utils.config import SystemConfig as _SC0

    _c_unsup = _SC0()
    _c_unsup = _dc0.replace(_c_unsup, engine=_dc0.replace(
        _c_unsup.engine, vi_align_bootstrap=False))
    r_unsup = run_vio(seq, cfg=_c_unsup, gt_scale=False)
    results["2_visual_inertial_imu_scale"] = {
        "ate": ate_rmse(r["poses"], r["gt"], align=False),
        "scale_ratio": float(el / gl),
        "ate_vi_ba": ate_rmse(r_vb["poses"], r_vb["gt"], align=False),
        "scale_ratio_vi_ba": float(el_vb / gl),
        "ate_open_unsupervised": ate_rmse(r_unsup["poses"], r_unsup["gt"],
                                          align=False),
    }

    # 3. Aggressive motion (config #3 analog): report each refinement variant
    # in BOTH scale modes. GT-scale (reference parity): photometric is
    # neutral-to-positive; online BA is exactly neutral BY DESIGN — the
    # 'ends' gauge pins the live anchor, and the anchor-refining 'oldest2'
    # gauge was measured to diverge here (0.115 -> 1.23). The flagship
    # GT-free VI mode is where online BA earns its compute: the 'marg'
    # marginalization-prior gauge (default) lets the window correct the
    # live anchor against evicted-keyframe information.
    seq3 = make_synthetic_sequence(SyntheticConfig(
        n_frames=60, n_landmarks=350, seed=1,
        trans_amp=(2.0, 1.4, 0.7), rot_amp=(0.12, 0.15, 0.3),
    ))
    r_plain = run_vio(seq3, gt_scale=True)
    r_photo = run_vio(seq3, gt_scale=True, photometric=True)
    r_ba = run_vio(seq3, gt_scale=True, ba=True)
    r_vi_open = run_vio(seq3, gt_scale=False)
    r_vi_ba = run_vio(seq3, gt_scale=False, vi_ba=True)  # 'ends' default
    import dataclasses as _dc

    from vislam_tpu.utils.config import SystemConfig as _SC

    _c_marg = _SC()
    _c_marg = _dc.replace(_c_marg, backend=_dc.replace(
        _c_marg.backend, online_gauge="marg"))
    r_vi_ba_marg = run_vio(seq3, cfg=_c_marg, gt_scale=False, vi_ba=True)
    results["3_aggressive"] = {
        "ate_plain": ate_rmse(r_plain["poses"], r_plain["gt"], align=False),
        "ate_photometric": ate_rmse(r_photo["poses"], r_photo["gt"], align=False),
        "ate_online_ba": ate_rmse(r_ba["poses"], r_ba["gt"], align=False),
        "ate_vi_open_loop": ate_rmse(r_vi_open["poses"], r_vi_open["gt"], align=False),
        "ate_vi_online_ba_ends": ate_rmse(r_vi_ba["poses"], r_vi_ba["gt"], align=False),
        "ate_vi_online_ba_marg": ate_rmse(r_vi_ba_marg["poses"], r_vi_ba_marg["gt"], align=False),
    }

    # 4. Loop trajectory + pose-graph correction (config #4 analog).
    seq4 = make_synthetic_sequence(SyntheticConfig(n_frames=86, n_landmarks=300, seed=21))
    r = run_vio(seq4, gt_scale=True, loop_correct=True)
    results["4_loop_correction"] = {
        "ate_open_loop": ate_rmse(r["poses"], r["gt"], align=False),
        "n_loops": len(r.get("loops", [])),
        "kf_maxerr_before": r.get("kf_err_before"),
        "kf_maxerr_after": r.get("kf_err_after"),
    }

    # 5. Multi-sequence batch (config #5 analog; single host, B=8 vmap;
    #    mesh-sharded variant validated in tests/dryrun).
    import jax.numpy as jnp

    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_batch_scan

    B = 8
    seqs = [make_synthetic_sequence(SyntheticConfig(n_frames=24, n_landmarks=250,
                                                    seed=s)) for s in range(B)]
    eng = VIOEngine(seqs[0]["calib"])
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[eng.initialize(s["images"][0], q_wb0=s["gt_quat"][0],
                         v_w0=s["gt_vel"][0], p_w0=s["gt_pos"][0]) for s in seqs],
    )
    inps = [make_sequence_inputs(s) for s in seqs]
    inputs = jax.tree.map(lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps)
    kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])
    f, res = run_batch_scan(eng, states, inputs, kf0)
    ates = [
        ate_rmse(np.asarray(res.p_wc[b]), seqs[b]["gt_pos"][1:24], align=False)
        for b in range(B)
    ]
    results["5_multi_sequence_batch"] = {
        "n_sequences": B, "ate_mean": float(np.mean(ates)),
        "ate_max": float(np.max(ates)),
    }

    # 2c. Cold start under the default GT-free mode (round 5).
    seq2c = make_synthetic_sequence(SyntheticConfig(
        n_frames=60, n_landmarks=300, seed=0))
    results["2c_cold_start"] = run_cold(seq2c)

    # 6. Long run (round 5, VERDICT #6): 500 frames, GT-free VI-BA, reloc
    # machinery + checkpoint round-trip + loop correction in one run.
    seq6 = make_synthetic_sequence(SyntheticConfig(
        n_frames=500, n_landmarks=400, seed=42))
    results["6_long_run"] = run_long(seq6)

    print(json.dumps(results, indent=2, default=float))

    # Append to the longitudinal history (configs are pinned; see PINNED).
    history[this_label] = json.loads(json.dumps(results, default=float))
    with open(HISTORY_PATH, "w") as fh:
        json.dump(history, fh, indent=1)

    prev = history.get(prev_label, {}) if prev_label else {}

    def p(cfg_key, field):
        return _fmt_prev(prev.get(cfg_key), field)

    with open("/root/repo/EVAL.md", "w") as fh:
        fh.write("# Evaluation configs (BASELINE.json analogs, synthetic oracle)\n\n")
        fh.write(
            "Real EUROC/KITTI are unreachable in this environment (zero\n"
            "egress); each config runs the corresponding regime on the\n"
            "synthetic oracle generator (exact GT). The CLI reads the real\n"
            "dataset formats, so these harnesses run unchanged on real data.\n\n"
            "Configs are PINNED (seeds/shapes frozen; scripts/eval_configs.py\n"
            f"PINNED table) and every row carries the previous round's value\n"
            f"({prev_label or 'none'}) so regressions are visible at a\n"
            "glance. Full per-round numbers: EVAL_HISTORY.json.\n\n"
        )
        fh.write(f"| # | config | result ({this_label}) | previous "
                 f"({prev_label or '—'}) |\n|---|---|---|---|\n")
        r1 = results["1_mono_gt_scale"]
        fh.write(f"| 1 | monocular odometry, GT scale, 80 frames | "
                 f"ATE {r1['ate']:.3f} m | {p('1_mono_gt_scale', 'ate')} |\n")
        r2 = results["2_visual_inertial_imu_scale"]
        k2 = "2_visual_inertial_imu_scale"
        fh.write(
            f"| 2 | visual-inertial, IMU (GT-free) scale: open-loop / "
            f"+VI-BA (the default GT-free mode) | ATE {r2['ate']:.3f} m "
            f"(scale {r2['scale_ratio']:.3f}) / ATE {r2['ate_vi_ba']:.3f} m "
            f"(scale {r2['scale_ratio_vi_ba']:.3f}) | {p(k2, 'ate')} / "
            f"{p(k2, 'ate_vi_ba')} |\n"
        )
        r3 = results["3_aggressive"]
        fh.write(
            f"| 3 | aggressive motion, GT scale: plain / +photometric / "
            f"+online-BA | ATE {r3['ate_plain']:.3f} / "
            f"{r3['ate_photometric']:.3f} / {r3['ate_online_ba']:.3f} m "
            f"(GT-scale online BA neutral by design: gauge pins the anchor) "
            f"| {p('3_aggressive', 'ate_plain')} / "
            f"{p('3_aggressive', 'ate_photometric')} / "
            f"{p('3_aggressive', 'ate_online_ba')} |\n"
        )
        fh.write(
            f"| 3b | aggressive motion, IMU (GT-free) scale: open-loop / "
            f"+online VI-BA ends gauge (default) / marg gauge (--gauge marg) "
            f"| ATE {r3['ate_vi_open_loop']:.3f} -> "
            f"{r3['ate_vi_online_ba_ends']:.3f} / "
            f"{r3['ate_vi_online_ba_marg']:.3f} m ('ends' default since "
            f"round 3: never loses to open-loop on the 5-scenario ensemble; "
            f"BENCH_NOTES) | {p('3_aggressive', 'ate_vi_open_loop')} -> "
            f"{p('3_aggressive', 'ate_vi_online_ba_ends')} / "
            f"{p('3_aggressive', 'ate_vi_online_ba_marg')} |\n"
        )
        r4 = results["4_loop_correction"]
        fh.write(
            f"| 4 | loop closure + pose graph | {r4['n_loops']} loops; "
            f"max kf err {r4['kf_maxerr_before']:.3f} -> "
            f"{r4['kf_maxerr_after']:.3f} m | "
            f"{p('4_loop_correction', 'kf_maxerr_before')} -> "
            f"{p('4_loop_correction', 'kf_maxerr_after')} |\n")
        r5 = results["5_multi_sequence_batch"]
        fh.write(
            f"| 5 | {r5['n_sequences']}-sequence batch (vmap; mesh-shard "
            f"validated) | ATE mean {r5['ate_mean']:.3f} / max "
            f"{r5['ate_max']:.3f} m | "
            f"{p('5_multi_sequence_batch', 'ate_mean')} / "
            f"{p('5_multi_sequence_batch', 'ate_max')} |\n")
        rc = results["2c_cold_start"]
        fh.write(
            f"| 2c | COLD start (v0=0), GT-free VI-BA + retroactive "
            f"bootstrap smoothing | ATE live {rc['ate_live']:.3f} / "
            f"smoothed {rc['ate_smoothed']:.3f} m "
            f"({rc['n_applies']} re-anchors, "
            f"latched={'yes' if rc['aligned'] else 'NO'}) | "
            f"{p('2c_cold_start', 'ate_smoothed')} |\n")
        r6 = results["6_long_run"]
        fh.write(
            f"| 6 | LONG run: 500 frames GT-free VI-BA, "
            f"{r6['n_keyframes']} kfs, checkpoint round-trip "
            f"{'OK' if r6['ckpt_resume_bitwise'] else 'FAIL'} | ATE "
            f"{r6['ate_full']:.3f} m (segments 1-100/100-300/300-500: "
            f"{r6['ate_f1_100']:.3f}/{r6['ate_f100_300']:.3f}/"
            f"{r6['ate_f300_500']:.3f}); {r6.get('n_loops', 0)} loops, "
            f"kf max err {r6.get('kf_maxerr_before', float('nan')):.3f} -> "
            f"{r6.get('kf_maxerr_after', float('nan')):.3f} m; "
            f"R-orthogonality err max {r6['ortho_err_max']:.1e} | "
            f"{p('6_long_run', 'ate_full')} |\n")
        fh.write(
            "\n## Drift notes (round-over-round attributions)\n\n"
            "- **r02 -> r03 config 1 (0.183 -> 0.199) and 3b marg (0.519 ->"
            " 0.867)**: both were the multi-scale detection default —\n"
            "  coarse-level keypoints carry 2-4 px quantization that "
            "poisons the epipolar solve. Fixed in r04 at the source\n"
            "  (FrontendConfig.solver_fine_only: the two-view solver uses "
            "fine-level matches only; matching/BA keep the capacity).\n"
            "  Residual r04 config-1 delta vs the r02 0.183: the "
            "dispersion-weighted RANSAC (+0.008 gentle, measured sweep in\n"
            "  BENCH_NOTES) bought the occlusion regime 0.167 -> 0.102 — "
            "the one regime the OpenCV reference still won.\n"
            "- **r04 -> r05 config 2 VI-BA (0.373 -> 0.418)**: the two-phase "
            "GT-free initialization (VI-BA inert until the alignment latch, "
            "~frame 13) — measured as the cause in isolation before the\n"
            "  round's other changes. The trade bought cold VI-BA 1.07-1.86 "
            "-> 0.42-0.77 (config 2c) and the 60-frame warm ensemble mean "
            "0.33 -> 0.22;\n"
            "  this 80-frame gentle run is the one case where the skipped "
            "early-window factors cost more than the supervised phase 1 "
            "returns.\n"
            "- **r02 -> r03 config 4 loops 6 -> 4**: multi-scale changed "
            "which frames promote to keyframes (the loop detector counts\n"
            "  keyframe-archive pairs); correction quality is the metric "
            "that matters and stayed (max kf err roughly halves).\n"
            "- **3b marg is expected to be unstable**: the marg gauge is "
            "chaotic on aggressive motion (BENCH_NOTES round-4 gauge\n"
            "  ensemble: catastrophic on 3/5 scenarios) and is opt-in; "
            "'ends' (the default) is the tracked number.\n"
        )
    print(f"wrote EVAL.md ({this_label}, previous {prev_label})")


if __name__ == "__main__":
    main()
