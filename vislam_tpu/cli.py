"""Command-line runner.

Role of the reference's CLI entry (/root/reference/src/main_vi_slam.cpp:24-44:
flags -gtFile -imagesPath -imuFile -calibrationFile -outputFile and the main
frame loop :114-355): dataset ingestion, per-frame engine stepping, trajectory
CSV streaming, final wall-time and ATE report.

Usage:
  python -m vislam_tpu.cli --dataset /path/to/euroc_seq --output traj.csv
  python -m vislam_tpu.cli --synthetic 60 --output traj.csv
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native visual-inertial SLAM")
    ap.add_argument("--dataset", help="dataset sequence directory")
    ap.add_argument("--format", default="euroc", choices=["euroc", "kitti", "tum"],
                    help="dataset directory layout")
    ap.add_argument("--sequence", default="00", help="KITTI sequence id")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="run on a generated synthetic sequence of N frames")
    ap.add_argument("--calibration", default=None,
                    help="euroc | kitti | tum | path to OpenCV-XML file "
                         "(default: matches --format)")
    ap.add_argument("--vision-rotation", action="store_true",
                    help="estimate rotation from the essential matrix instead "
                         "of the IMU (auto-enabled for KITTI)")
    ap.add_argument("--photometric", action="store_true",
                    help="refine each two-view pose by direct intensity "
                         "alignment (measured ~11%% ATE improvement)")
    ap.add_argument("--output", default="outputVISlam.csv", help="trajectory CSV")
    ap.add_argument("--start", type=int, default=None, help="first frame index")
    ap.add_argument("--end", type=int, default=None, help="last frame index (excl)")
    ap.add_argument("--gt-scale", action="store_true", default=True,
                    help="use GT translation norm for monocular scale (reference parity)")
    ap.add_argument("--imu-scale", dest="gt_scale", action="store_false",
                    help="use IMU preintegration for scale instead of GT")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--scan", action="store_true",
                    help="offline mode: stage all frames and run the whole "
                         "sequence as one on-device scan (max throughput; "
                         "--ba fuses the window BA into the scanned step; "
                         "--loop-correct archives keyframes from the scan "
                         "outputs)")
    ap.add_argument("--reloc", action="store_true",
                    help="relocalize against the keyframe archive after a "
                         "visual outage (host-loop modes): place recognition "
                         "+ PnP snap the drifted pose back onto the map")
    ap.add_argument("--output-tum", default=None, metavar="PATH.txt",
                    help="also write the trajectory in TUM format "
                         "(timestamp tx ty tz qx qy qz qw) for the standard "
                         "evaluation toolchains (evo, TUM scripts)")
    ap.add_argument("--save-map", default=None, metavar="PATH.npz",
                    help="save the keyframe archive (map) after the run "
                         "for later --load-map sessions")
    ap.add_argument("--load-map", default=None, metavar="PATH.npz",
                    help="preload a saved keyframe map: --reloc localizes "
                         "against it from frame one (map reuse) and "
                         "--loop-correct sees its keyframes too")
    ap.add_argument("--ba", action="store_true",
                    help="run sliding-window bundle adjustment on each keyframe")
    ap.add_argument("--open-loop", action="store_true",
                    help="disable the window BA that --imu-scale enables by "
                         "default (round 3: GT-free runs default to online "
                         "VI-BA with the 'ends' gauge — never loses to "
                         "open-loop on the BENCH_NOTES ensemble — which also "
                         "activates online IMU-bias estimation)")
    ap.add_argument("--vi-ba", action="store_true",
                    help="add preintegrated-IMU factors to the window BA "
                         "(visual-inertial BA: scale/gravity/velocity become "
                         "observable; auto-enabled for --ba --imu-scale)")
    ap.add_argument("--dist-ba", type=int, default=0, metavar="N",
                    help="after the run, refine the final keyframe window "
                         "with the DISTRIBUTED (visual-inertial) window BA "
                         "on an N-device mesh: landmarks shard across "
                         "devices, one psum per LM iteration reduces the "
                         "Schur camera system (parallel/dist_ba.py). On a "
                         "single-chip host this exercises the multi-chip "
                         "code path on the virtual CPU mesh; on a pod "
                         "slice the same path rides ICI")
    ap.add_argument("--gauge", default=None,
                    choices=["marg", "ends", "oldest2"],
                    help="online-BA window gauge (default: config 'ends' — "
                         "never loses to open-loop on the round-3 ensemble). "
                         "'marg' (marginalization prior) wins gentle/low-"
                         "dynamic runs but loses on aggressive motion and "
                         "drifting bias; see BENCH_NOTES round 3")
    ap.add_argument("--loop-correct", action="store_true",
                    help="offline loop-closure detection + pose-graph "
                         "correction after the run")
    ap.add_argument("--loop-sim3", action="store_true",
                    help="use a 7-DoF Sim(3) pose graph for --loop-correct "
                         "(distributes monocular scale drift along the "
                         "trajectory; for --imu-scale / vision-only runs)")
    ap.add_argument("--plot", default=None,
                    help="write trajectory/state plots with this path prefix")
    ap.add_argument("--live-viz", default=None, metavar="PREFIX",
                    help="live observability: atomically rewrite "
                         "PREFIX_live.png (trajectory-so-far snapshot) every "
                         "few keyframes during the run (role of the "
                         "reference's RViz publishers, middleware-free)")
    ap.add_argument("--detector", default="shi_tomasi",
                    choices=["shi_tomasi", "harris", "dog", "hessian", "fast"],
                    help="corner/blob response family (role of the reference "
                         "detector factory: SIFT~dog, SURF~hessian, ORB~fast)")
    ap.add_argument("--scale-space", default="gaussian",
                    choices=["gaussian", "nonlinear"],
                    help="pyramid type: gaussian (SIFT/SURF/ORB family) or "
                         "nonlinear Perona-Malik FED diffusion (KAZE/AKAZE "
                         "family; e.g. --scale-space nonlinear --detector "
                         "hessian = KAZE analog)")
    ap.add_argument("--descriptor", default="sift", choices=["sift", "brief"],
                    help="float SIFT-128 or binary steered-BRIEF-256 "
                         "(Hamming-equivalent MXU matching)")
    ap.add_argument("--oriented", action="store_true",
                    help="rotate descriptors by keypoint orientation "
                         "(rotation invariance; upright is default for VIO)")
    ap.add_argument("--checkpoint", default=None,
                    help="engine-state checkpoint path (.npz): the full state "
                         "pytree is saved on every keyframe and at run end "
                         "(the reference has no checkpointing, SURVEY.md §5)")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint at the stored frame index "
                         "(exact: deterministic dataset indexing + state "
                         "pytree restore)")
    args = ap.parse_args(argv)

    if args.resume and not args.checkpoint:
        ap.error("--resume requires --checkpoint")

    # GT-free (IMU-scale) runs default to online VI-BA: the 'ends'-gauge
    # window BA never loses to open-loop on the round-3 ensemble and brings
    # online accel/gyro-bias estimation to the default path (--open-loop
    # opts out). Visual-inertial factors whenever BA runs GT-free — that's
    # exactly when scale needs the IMU factors.
    if not args.gt_scale and not args.open_loop:
        args.vi_ba = True
    use_vi_ba = args.vi_ba or (args.ba and not args.gt_scale)
    args.ba = args.ba or args.vi_ba  # --vi-ba alone implies window BA

    def _with_frontend(cfg_):
        """Apply detector/descriptor/VI-BA CLI choices to a SystemConfig."""
        import dataclasses as _d

        if (args.detector, args.descriptor, args.oriented,
                args.scale_space) != ("shi_tomasi", "sift", False, "gaussian"):
            cfg_ = _d.replace(cfg_, frontend=_d.replace(
                cfg_.frontend, detector=args.detector,
                descriptor=args.descriptor, oriented=args.oriented,
                scale_space=args.scale_space,
            ))
        if use_vi_ba:
            cfg_ = _d.replace(
                cfg_, backend=_d.replace(cfg_.backend, vi_factors=True)
            )
        if args.gauge:
            # Applied here (not in the --dataset branch) so --synthetic runs
            # honor --gauge too.
            cfg_ = _d.replace(
                cfg_, backend=_d.replace(cfg_.backend, online_gauge=args.gauge)
            )
        return cfg_

    import os as _os

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent XLA compile cache: without it every CLI invocation pays the
    # full step compile (~2-6 min over the TPU tunnel) — measured 12.9 s/frame
    # mean on a 30-frame run vs 60-90 ms/frame warm (round 4). bench.py and
    # the test conftest already do this; the CLI must too.
    _cache = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import jax.numpy as jnp

    from vislam_tpu import lie
    from vislam_tpu.calib import euroc_calib, kitti_calib, tum_calib, load_opencv_xml
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.engine.refine import refine_window
    from vislam_tpu.eval import ate_rmse, write_trajectory_csv
    from vislam_tpu.utils.timing import StageTimer

    timer = StageTimer()
    rows = []
    est_positions = []
    gt_positions = []
    kf_archive = []
    # Round 5: shadow track + bootstrap apply counter per frame, for the
    # retroactive bootstrap smoothing of GT-free cold starts
    # (eval/smooth.py). Both ride the packed result — no extra fetches.
    shadow_track = []
    apply_track = []

    def save_ckpt(state, frame_index, last_kf, last_kf_pos=None):
        if not args.checkpoint:
            return
        from vislam_tpu.utils.checkpoint import save_checkpoint

        with timer.stage("checkpoint.save"):
            save_checkpoint(
                args.checkpoint, state, frame_index,
                meta={
                    "last_kf": int(last_kf),
                    "last_kf_pos": None if last_kf_pos is None
                    else [float(x) for x in np.asarray(last_kf_pos)],
                },
            )

    def load_ckpt():
        from vislam_tpu.utils.checkpoint import (
            load_checkpoint, load_checkpoint_meta,
        )

        state, fidx = load_checkpoint(args.checkpoint)
        meta = load_checkpoint_meta(args.checkpoint)
        print(f"resumed from {args.checkpoint} at frame {fidx}")
        return state, fidx, meta

    if args.load_map:
        from vislam_tpu.backend.mapio import load_map

        kf_archive.extend(load_map(args.load_map))
        print(f"loaded map: {len(kf_archive)} keyframes from {args.load_map}")

    def archive_keyframe(state, frame_index):
        if not (args.loop_correct or args.reloc or args.save_map):
            return
        from vislam_tpu.backend.trajectory_opt import record_from_feat

        # Fine-level keypoints only (coarse localization degrades the
        # loop/reloc PnP; see record_from_feat).
        kf_archive.append(record_from_feat(
            frame_index, state.kf_R_wc, state.kf_p_wc, state.kf_feat))

    live = None
    if args.live_viz:
        from vislam_tpu.viz import LiveViz

        live = LiveViz(args.live_viz)

    outage = {"n": 0}
    last_good = {"R": None, "p": None}

    def maybe_recover(eng, state, image, res, frame_index):
        """Divergence guard: a non-finite pose re-anchors tracking at the
        last finite pose (relocalize restarts the window and sanitizes
        velocity/biases). Failure-recovery the reference lacks entirely
        (it exit()s on bad input, never on bad numerics)."""
        p = np.asarray(res.p_wc)
        if np.isfinite(p).all():
            last_good["R"] = np.asarray(res.R_wc) if hasattr(res, "R_wc") \
                else np.asarray(state.R_wc)
            last_good["p"] = p
            return state, res
        if last_good["p"] is None:
            return state, res
        print(f"divergence at frame {frame_index}: non-finite pose; "
              f"re-anchoring at last good pose")
        state = eng.relocalize(state, image, last_good["R"], last_good["p"])
        q_np = np.asarray(state.q_wb)
        res = res._replace(
            p_wc=np.asarray(state.p_wc), q_wb=q_np, is_keyframe=True,
            rpy=np.asarray(lie.quat_to_rpy(jnp.asarray(q_np))))
        return state, res

    def maybe_relocalize(eng, state, image, res, calib):
        """After >=3 consecutive low-match frames, try snapping back onto the
        map (backend/reloc.py). Returns the (possibly re-anchored) state."""
        if not args.reloc:
            return state
        if int(res.num_matches) >= 20:
            outage["n"] = 0
            return state
        outage["n"] += 1
        if outage["n"] < 3 or len(kf_archive) < 2:
            return state
        from vislam_tpu.backend.reloc import attempt_relocalization
        from vislam_tpu.frontend.features import extract_features

        with timer.stage("reloc.attempt"):
            f = extract_features(jnp.asarray(image, jnp.float32),
                                 eng.cfg.frontend)
            r = attempt_relocalization(
                np.asarray(f.uv), np.asarray(f.desc), np.asarray(f.mask),
                kf_archive, calib.fx, calib.fy, calib.cx, calib.cy,
            )
        if r.success:
            print(f"relocalized against keyframe "
                  f"{kf_archive[r.kf_index].frame_index} "
                  f"({r.n_inliers} inliers, rmse {r.rmse:.2f} px)")
            outage["n"] = 0
            return eng.relocalize(state, image, r.R_wc, r.p_wc)
        return state

    if args.synthetic:
        from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence

        seq = make_synthetic_sequence(
            SyntheticConfig(n_frames=args.synthetic, n_landmarks=300, seed=0)
        )
        calib = seq["calib"]
        import dataclasses as _dc

        from vislam_tpu.utils.config import SystemConfig as _SC

        _cfg = _with_frontend(_SC())
        if args.photometric:
            _cfg = _dc.replace(
                _cfg, engine=_dc.replace(_cfg.engine, photometric_refine=True)
            )
        if args.ba:
            # Round 4: the host loop fuses the windowed BA into the step
            # (lax.cond on keyframe promotion) instead of a separate
            # refine_window dispatch — same math, one fewer device
            # round-trip per keyframe, and it keeps the loop pipelineable
            # (no host-side state feedback between frames).
            _cfg = _dc.replace(
                _cfg, backend=_dc.replace(_cfg.backend, refine_in_step=True)
            )
        eng = VIOEngine(calib, _cfg)
        state = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
        )
        last_kf = 0
        start_j = 1
        if args.resume:
            state, fidx, _meta = load_ckpt()
            start_j = fidx + 1
            last_kf = int(_meta.get("last_kf", fidx))
            eng.set_step_counter(fidx)  # replay the exact per-step keys
        # PIPELINED host loop (round 4): dispatch runs ahead; packed
        # per-frame results are fetched in BURSTS of PIPE_BURST frames as
        # ONE device->host transfer (jnp.stack of the flat vectors) — each
        # RPC costs ~25 ms RTT regardless of payload, so per-frame fetch
        # cost becomes RTT/PIPE_BURST. The GT-scale norm rides a
        # device-side carry (step_pipelined), so there is NO per-frame
        # host feedback; keyframe bookkeeping / divergence recovery /
        # relocalization process results <= PIPE_BURST frames behind the
        # dispatch head (they keep the per-frame device state refs they
        # need — nothing extra is fetched). Threaded fetch/upload pools
        # were measured and REJECTED: concurrent RPCs trigger the tunnel's
        # pathological serialization (693 ms/frame vs 13 single-threaded).
        from collections import deque as _deque

        from vislam_tpu.engine.engine import unpack_host_result

        pending = _deque()
        PIPE_BURST = 4
        kf_gt_pos = np.asarray(seq["gt_pos"][last_kf], np.float32)
        gt_on = 1.0 if args.gt_scale else 0.0

        def _drain_all():
            nonlocal state, last_kf, kf_gt_pos
            if not pending:
                return
            flats = np.asarray(jnp.stack([f for (_, _, _, f) in pending]))
            items = list(pending)
            pending.clear()
            # Recovery/relocalization re-anchor the DISPATCH-HEAD state, so
            # they must solve against the newest dispatched image, not the
            # drained frame's (advisor, round 4: the drained frame runs up
            # to PIPE_BURST frames behind the head — pairing the head state
            # with a stale image relocalizes against geometry the state no
            # longer corresponds to).
            head_img = items[-1][2]
            for row, (j, st_j, img_j, _) in zip(flats, items):
                _process_one(j, st_j, img_j, head_img,
                             unpack_host_result(row))

        def _process_one(j, st_j, img_j, head_img, res):
            nonlocal state, last_kf, kf_gt_pos
            if res.is_keyframe:
                last_kf = j
                archive_keyframe(st_j, j)
                save_ckpt(st_j, j, last_kf)
            state, res2 = maybe_recover(eng, state, head_img, res, j)
            res = res2
            new_state = maybe_relocalize(eng, state, head_img, res, calib)
            if new_state is not state:
                state = new_state
                last_kf = j  # tracking re-anchored at this frame
                kf_gt_pos = np.asarray(seq["gt_pos"][j], np.float32)
                q_np = np.asarray(state.q_wb)
                res = res._replace(
                    p_wc=np.asarray(state.p_wc), q_wb=q_np, is_keyframe=True,
                    rpy=np.asarray(lie.quat_to_rpy(jnp.asarray(q_np))))
            est_positions.append(np.asarray(res.p_wc))
            gt_positions.append(seq["gt_pos"][j])
            if hasattr(res, "shadow_p_wc"):
                shadow_track.append(np.asarray(res.shadow_p_wc))
                apply_track.append(int(res.bootstrap_applies))
            if live is not None:
                live.update(j, res.p_wc, seq["gt_pos"][j],
                            bool(res.is_keyframe))
            rows.append(dict(
                frame=j, t_ns=int(seq["t_cam_ns"][j]), is_kf=bool(res.is_keyframe),
                est_p=np.asarray(res.p_wc),
                est_rpy=np.asarray(res.rpy),
                est_q=np.asarray(res.q_wb), est_v=np.asarray(res.v_w),
                gt_p=seq["gt_pos"][j], gt_rpy=seq["gt_rpy"][j],
                gt_q=seq["gt_quat"][j], gt_v=seq["gt_vel"][j],
            ))

        # Warm the compiled step before the timed loop (one discarded
        # dispatch): executable build / persistent-cache deserialization +
        # upload is startup cost, not per-frame throughput — the reference
        # also starts its wall clock after initialization
        # (/root/reference/src/main_vi_slam.cpp:113).
        _saved_counter = eng._step_counter
        _, _, _wf = eng.step_pipelined(
            state, kf_gt_pos, seq["images"][start_j],
            np.zeros((16, 6), np.float32), np.zeros(16, np.float32),
            seq["gt_pos"][start_j], gt_on)
        np.asarray(_wf)
        eng.set_step_counter(_saved_counter)

        t0 = time.perf_counter()
        for j in range(start_j, args.synthetic):
            lo, hi = (j - 1) * 10, j * 10
            imu = np.zeros((16, 6), np.float32)
            imu[:10] = np.concatenate(
                [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
            )
            dt = np.zeros(16, np.float32)
            dt[:10] = 1 / 200.0
            with timer.stage("engine.step"):
                # Image uploads ride the dispatch in native uint8 (4x fewer
                # tunnel bytes; the step casts on device).
                state, kf_gt_pos, flat = eng.step_pipelined(
                    state, kf_gt_pos, seq["images"][j], imu, dt,
                    seq["gt_pos"][j], gt_on,
                )
            pending.append((j, state, seq["images"][j], flat))
            if len(pending) >= PIPE_BURST:
                _drain_all()
        _drain_all()
        wall = time.perf_counter() - t0
        save_ckpt(state, args.synthetic - 1, last_kf)
    elif args.dataset:
        from vislam_tpu.data import (
            EurocDataset, KittiDataset, TumDataset, PrefetchLoader,
        )
        from vislam_tpu.inertial import static_mask, calibrate_gyro_bias

        calib_name = args.calibration or args.format
        if calib_name in ("euroc", "kitti", "tum"):
            calib = {"euroc": euroc_calib, "kitti": kitti_calib, "tum": tum_calib}[
                calib_name
            ]()
        else:
            calib = load_opencv_xml(calib_name)
        if args.format == "kitti":
            ds = KittiDataset(args.dataset, args.sequence)
        elif args.format == "tum":
            ds = TumDataset(args.dataset)
        else:
            ds = EurocDataset(args.dataset)
        start = ds.start_index if args.start is None else args.start
        end = len(ds) if args.end is None else args.end

        # Gyro bias from the stationary prefix (reference calibrates until
        # t < 2500 ms, src/Imu.cpp:423-428); EUROC only.
        bias_g = None
        if hasattr(ds, "static_imu_prefix"):
            g_pre, a_pre = ds.static_imu_prefix(2.5)
            if len(g_pre) > 50:
                m = static_mask(jnp.asarray(g_pre), jnp.asarray(a_pre))
                bias_g = np.asarray(calibrate_gyro_bias(jnp.asarray(g_pre), m))

        import dataclasses

        from vislam_tpu.utils.config import SystemConfig

        cfg = _with_frontend(SystemConfig())
        if args.vision_rotation or args.format == "kitti":
            # Vision-only rotation (essential matrix) needs fine keypoint
            # localization: coarse-level keypoints (2-4 px quantization)
            # measurably break the 8-point solve (seed-swept: ATE 0.8 -> 3.6,
            # keyframes 8 -> 0 on the worst draw) — single-scale here.
            cfg = dataclasses.replace(
                cfg,
                engine=dataclasses.replace(cfg.engine, vision_rotation=True),
                frontend=dataclasses.replace(cfg.frontend, levels_used=1),
            )
        if args.photometric:
            cfg = dataclasses.replace(
                cfg, engine=dataclasses.replace(cfg.engine, photometric_refine=True)
            )
        if args.ba:
            # Fuse the windowed BA into the step itself (lax.cond on
            # keyframes). Round 4: the HOST loop uses this too — same math
            # as the old per-keyframe refine_window call, one fewer device
            # round-trip per keyframe, and no host-side state feedback (the
            # online loop stays pipelineable).
            cfg = dataclasses.replace(
                cfg, backend=dataclasses.replace(cfg.backend,
                                                 refine_in_step=True)
            )
        # Real cameras are distorted: precompute the rectify maps once and
        # remap every frame on device (reference CameraModel::Undistort,
        # src/CameraModel.cpp:84-105); the engine then runs on the
        # distortion-free rectified intrinsics.
        undistort = None
        if calib.has_distortion:
            from vislam_tpu.calib import compute_undistort_maps, remap_bilinear

            with timer.stage("undistort.precompute"):
                maps, calib = compute_undistort_maps(calib)
            maps_j = jnp.asarray(maps)
            import jax as _jax

            _remap = _jax.jit(lambda im: remap_bilinear(im, maps_j))

            def undistort(img):
                return _remap(jnp.asarray(img, jnp.float32))

        eng = VIOEngine(calib, cfg)
        fw0 = ds.frame_window(start)
        if undistort is not None:
            import dataclasses as _dc2

            fw0 = _dc2.replace(fw0, image=np.asarray(undistort(fw0.image)))
        gt_q0 = fw0.gt_quat if fw0.gt_quat is not None else np.array([1.0, 0, 0, 0])
        gt_p0 = fw0.gt_pos if fw0.gt_pos is not None else np.zeros(3)
        gt_v0 = fw0.gt_vel if fw0.gt_vel is not None else np.zeros(3)
        state = eng.initialize(fw0.image, q_wb0=gt_q0, v_w0=gt_v0, p_w0=gt_p0)
        if bias_g is not None:
            state = state._replace(bias_g=jnp.asarray(bias_g, jnp.float32))

        if args.scan:
            from vislam_tpu.engine import run_sequence_scan, stage_dataset

            with timer.stage("scan.stage"):
                inputs = stage_dataset(
                    ds, start + 1, end, use_gt_scale=args.gt_scale,
                    undistort=undistort,
                )
            with timer.stage("scan.run"):
                state, results = run_sequence_scan(
                    eng, state, inputs, kf_gt_pos0=gt_p0
                )
                import jax as _jax2

                # Completion barrier = HOST FETCH: block_until_ready is a
                # no-op on this backend (BENCH_NOTES "the enqueue
                # illusion"); fetching the whole result tree at once also
                # avoids per-frame ~25 ms RTTs in the loop below.
                results = _jax2.tree.map(np.asarray, results)
                rpy_all = np.asarray(
                    _jax2.vmap(lie.quat_to_rpy)(jnp.asarray(results.q_wb)))
            wall = timer.total["scan.run"]
            n_res = int(results.p_wc.shape[0])
            gt_pos_np = np.asarray(inputs.gt_pos)
            for k in range(n_res):
                j = start + 1 + k
                p = results.p_wc[k]
                est_positions.append(p)
                gtp = gt_pos_np[k]
                if bool(inputs.use_gt_scale):
                    gt_positions.append(gtp)
                rows.append(dict(
                    frame=j, t_ns=int(ds.image_t_ns[j]),
                    is_kf=bool(results.is_keyframe[k]),
                    est_p=p,
                    est_rpy=rpy_all[k],
                    est_q=results.q_wb[k],
                    est_v=results.v_w[k],
                    gt_p=gtp if bool(inputs.use_gt_scale) else None,
                    gt_rpy=None, gt_q=None, gt_v=None,
                ))
            frames_done = n_res
            if args.loop_correct:
                # Archive keyframes from the scan outputs: features for the
                # promoted frames are re-extracted from the staged images
                # (the scan itself carries no descriptors).
                from vislam_tpu.backend.trajectory_opt import (
                    keyframes_from_scan,
                )

                with timer.stage("loop.archive"):
                    kf_archive.extend(keyframes_from_scan(
                        inputs.images, results, cfg.frontend,
                        frame_offset=start + 1,
                    ))
        else:
            frames_done = None

        last_kf_pos = gt_p0
        loop_start = start + 1
        if args.resume and not args.scan:
            state, fidx, _meta = load_ckpt()
            loop_start = fidx + 1
            if _meta.get("last_kf_pos") is not None:
                last_kf_pos = np.asarray(_meta["last_kf_pos"], np.float64)
            eng.set_step_counter(fidx - start)  # exact key-sequence replay
        # PIPELINED online loop (round 4; see the --synthetic branch for
        # the design + the measured rejection of threaded pools): dispatch
        # ahead, fetch packed results in one-RPC bursts, process
        # <= PIPE_BURST frames behind. GT-scale norm rides the device carry.
        from collections import deque as _deque

        from vislam_tpu.engine.engine import unpack_host_result

        pending = _deque()
        PIPE_BURST = 4
        kf_gt_pos = np.asarray(last_kf_pos, np.float32)

        def _drain_all():
            nonlocal state, last_kf_pos, kf_gt_pos
            if not pending:
                return
            flats = np.asarray(jnp.stack([f for (_, _, _, f) in pending]))
            items = list(pending)
            pending.clear()
            for row, (fw, img_in, st_j, _) in zip(flats, items):
                _process_one(fw, img_in, st_j, unpack_host_result(row))

        def _process_one(fw, img_in, st_j, res):
            nonlocal state, last_kf_pos, kf_gt_pos
            if res.is_keyframe:
                if fw.gt_pos is not None:
                    last_kf_pos = fw.gt_pos
                archive_keyframe(st_j, fw.index)
                save_ckpt(st_j, fw.index, fw.index, last_kf_pos=last_kf_pos)
            state, res2 = maybe_recover(eng, state, img_in, res, fw.index)
            res = res2
            new_state = maybe_relocalize(eng, state, img_in, res, calib)
            if new_state is not state:
                state = new_state
                if fw.gt_pos is not None:
                    last_kf_pos = fw.gt_pos
                    kf_gt_pos = np.asarray(fw.gt_pos, np.float32)
                q_np = np.asarray(state.q_wb)
                res = res._replace(
                    p_wc=np.asarray(state.p_wc), q_wb=q_np, is_keyframe=True,
                    rpy=np.asarray(lie.quat_to_rpy(jnp.asarray(q_np))))
            est_positions.append(np.asarray(res.p_wc))
            if hasattr(res, "shadow_p_wc"):
                shadow_track.append(np.asarray(res.shadow_p_wc))
                apply_track.append(int(res.bootstrap_applies))
            if fw.gt_pos is not None:
                gt_positions.append(fw.gt_pos)
            if live is not None:
                live.update(fw.index, res.p_wc, fw.gt_pos,
                            bool(res.is_keyframe))
            rows.append(dict(
                frame=fw.index, t_ns=fw.t_ns, is_kf=bool(res.is_keyframe),
                est_p=np.asarray(res.p_wc),
                est_rpy=np.asarray(res.rpy),
                est_q=np.asarray(res.q_wb), est_v=np.asarray(res.v_w),
                gt_p=fw.gt_pos,
                gt_rpy=None if fw.gt_quat is None
                else np.asarray(lie.quat_to_rpy(jnp.asarray(fw.gt_quat, jnp.float32))),
                gt_q=fw.gt_quat, gt_v=fw.gt_vel,
            ))

        # Warm the compiled step before the timed loop (see --synthetic).
        if not args.scan and loop_start < end:
            _saved_counter = eng._step_counter
            _fw0 = ds.frame_window(loop_start)
            _img0 = _fw0.image if undistort is None else undistort(_fw0.image)
            _, _, _wf = eng.step_pipelined(
                state, kf_gt_pos, _img0, _fw0.imu, _fw0.imu_dt,
                np.zeros(3), 0.0)
            np.asarray(_wf)
            eng.set_step_counter(_saved_counter)

        t0 = time.perf_counter()
        for fw in (PrefetchLoader(ds, start=loop_start, end=end)
                   if not args.scan else []):
            img_in = fw.image
            if undistort is not None:
                with timer.stage("undistort"):
                    img_in = undistort(img_in)
            has_gt = args.gt_scale and fw.gt_pos is not None
            gt_p = fw.gt_pos if fw.gt_pos is not None else np.zeros(3)
            with timer.stage("engine.step"):
                state, kf_gt_pos, flat = eng.step_pipelined(
                    state, kf_gt_pos, img_in, fw.imu, fw.imu_dt,
                    gt_p, 1.0 if has_gt else 0.0,
                )
            pending.append((fw, img_in, state, flat))
            if len(pending) >= PIPE_BURST:
                _drain_all()
        _drain_all()
        if not args.scan:
            wall = time.perf_counter() - t0
    else:
        ap.error("either --dataset or --synthetic is required")
        return 2

    if args.dist_ba:
        from vislam_tpu.engine.refine import refine_window_distributed
        from vislam_tpu.parallel import make_mesh

        mesh = make_mesh(args.dist_ba)
        with timer.stage("dist_ba.refine"):
            state, dinfo = refine_window_distributed(
                state, eng.cfg, calib.fx, calib.fy, calib.cx, calib.cy,
                mesh=mesh, R_bc=eng.R_bc,
            )
        print(f"distributed window BA (mesh={args.dist_ba} devices): "
              f"cost {float(dinfo['initial_cost']):.4f} -> "
              f"{float(dinfo['final_cost']):.4f} "
              f"({'accepted' if dinfo['accepted'] else 'rejected'})")
        if dinfo["accepted"] and rows:
            # The final window's refined poses patch the trailing keyframe
            # rows of the trajectory (offline polish, like --loop-correct).
            win = state.window
            Wn = int(win.valid.shape[0])
            kf_rows = [r for r in rows if r["is_kf"]]
            n_back = min(int(np.asarray(win.count)), len(kf_rows))
            import numpy as _np

            R_cw = _np.asarray(win.R_cw)
            t_cw = _np.asarray(win.t_cw)
            for i in range(n_back):
                slot = int(_np.asarray(win.count)) - n_back + i
                p_w = -R_cw[slot].T @ t_cw[slot]
                kf_rows[len(kf_rows) - n_back + i]["est_p"] = p_w

    if args.loop_correct and len(kf_archive) > 10:
        from vislam_tpu.backend.trajectory_opt import correct_trajectory

        with timer.stage("loop.correct"):
            p_corr, R_corr, info = correct_trajectory(
                kf_archive, calib.fx, calib.fy, calib.cx, calib.cy,
                use_sim3=args.loop_sim3,
            )
        print(f"loop closures: {info['loops']}")
        if info["loops"]:
            # Patch corrected keyframe positions into the output rows.
            by_frame = {k.frame_index: i for i, k in enumerate(kf_archive)}
            for r in rows:
                i = by_frame.get(r["frame"])
                if i is not None:
                    r["est_p"] = p_corr[i]

    if live is not None:
        out_png = live.close()
        if out_png:
            print(f"live snapshot: {out_png}")
    if args.save_map and kf_archive:
        from vislam_tpu.backend.mapio import save_map

        save_map(args.save_map, kf_archive)
        print(f"map saved: {len(kf_archive)} keyframes to {args.save_map}")
    write_trajectory_csv(args.output, rows)
    if args.output_tum:
        from vislam_tpu.eval import write_trajectory_tum

        write_trajectory_tum(args.output_tum, rows)
        print(f"TUM-format trajectory written to {args.output_tum}")
    n = len(rows)
    print(f"processed {n} frames in {wall:.2f}s ({n / max(wall, 1e-9):.1f} fps)")
    print(timer.report())
    smoothed = None
    if (not args.gt_scale and len(shadow_track) == len(est_positions)
            and apply_track and apply_track[-1] > 0):
        from vislam_tpu.eval import smooth_bootstrap_prefix
        smoothed = smooth_bootstrap_prefix(
            np.array(est_positions), np.array(shadow_track),
            np.array(apply_track), np.asarray(state.origin_p_wc),
            np.asarray(state.shadow_origin_p))
        print(f"bootstrap smoothing: re-anchored prefix rewritten "
              f"({apply_track[-1]} applies)")
    if gt_positions and len(gt_positions) == len(est_positions):
        est = np.array(est_positions)
        gt = np.array(gt_positions)
        print(f"ATE RMSE (unaligned): {ate_rmse(est, gt, align=False):.4f} m")
        print(f"ATE RMSE (SE3-aligned): {ate_rmse(est, gt):.4f} m")
        if smoothed is not None:
            print(f"ATE RMSE (bootstrap-smoothed, unaligned): "
                  f"{ate_rmse(smoothed, gt, align=False):.4f} m")
    print(f"trajectory written to {args.output}")
    if args.plot:
        from vislam_tpu.eval import read_trajectory_csv
        from vislam_tpu.viz import plot_state_comparison, plot_trajectory

        traj = read_trajectory_csv(args.output)
        plot_trajectory(traj, args.plot + "_traj.png")
        plot_state_comparison(traj, args.plot + "_state.png")
        print(f"plots written to {args.plot}_traj.png / _state.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
