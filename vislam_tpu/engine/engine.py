"""The VIO engine: one jit-compiled per-frame step.

Role of the reference VISystem::AddFrame pipeline
(/root/reference/src/VISystem.cpp:271-404) — IMU estimate, feature
detect/describe/match, disparity, epipolar translation solve, keyframe
policy, SE(3) track composition (Track, :1567-1635) — fused into a single
XLA program per frame. Everything inside `step` is fixed-shape; keyframe
promotion is a boolean that gates state updates via where(), not control
flow, so the same compiled program serves both outcomes (the TPU idiom for
the reference's branching).

The blocking manual-keyframe UI of the reference (waitKey 'k',
/root/reference/src/VISystem.cpp:364-375) is replaced by its own coded
automatic thresholds (22 px disparity / 5 deg rotation, :313-316).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vislam_tpu import lie
from vislam_tpu.calib.camera_model import CameraCalib, unproject_pixels
from vislam_tpu.frontend.features import Features, extract_features
from vislam_tpu.frontend.match import match_descriptors
from vislam_tpu.frontend.pose import (
    ransac_translation,
    resolve_direction_sign,
    rotation_compensated_disparity,
)
from vislam_tpu.frontend.essential import ransac_essential
from vislam_tpu.inertial.filters import madgwick_scan
from vislam_tpu.inertial.preintegration import (
    Preintegrated,
    bias_correct,
    compose,
    preintegrate,
)
from vislam_tpu.engine.state import EngineState, init_state
from vislam_tpu.utils.config import SystemConfig


class FrameResult(NamedTuple):
    """Per-frame outputs (host-side consumable)."""

    p_wc: jnp.ndarray        # (3,) camera position estimate
    R_wc: jnp.ndarray        # (3, 3)
    q_wb: jnp.ndarray        # (4,) body orientation from the filter
    v_w: jnp.ndarray         # (3,)
    is_keyframe: jnp.ndarray  # () bool
    num_matches: jnp.ndarray  # () int32
    num_inliers: jnp.ndarray  # () int32
    disparity: jnp.ndarray    # () float32
    t_dir_cam: jnp.ndarray    # (3,) translation direction (new-cam frame)
    used_fallback: jnp.ndarray  # () bool — rescue guided re-match engaged
    t_pred_cam: jnp.ndarray   # (3,) IMU-predicted keyframe->frame translation
                              # (new-cam frame, metric) — rescue-trigger and
                              # diagnostics signal


class HostFrameResult(NamedTuple):
    """Per-frame outputs, fetched to the host in ONE transfer (round 4).

    The host-loop CLI previously fetched FrameResult leaf by leaf —
    ~8 fetches x ~25 ms tunnel RTT per frame plus an extra quat->rpy
    round-trip, ~250 ms/frame of pure transfer (the VERDICT r03
    fps_host_loop=3.5 root cause). step_host() packs everything into one
    (37,) device vector, fetches once, and unpacks to numpy here."""

    p_wc: np.ndarray
    R_wc: np.ndarray
    q_wb: np.ndarray
    v_w: np.ndarray
    rpy: np.ndarray
    is_keyframe: bool
    num_matches: int
    num_inliers: int
    disparity: float
    t_dir_cam: np.ndarray
    used_fallback: bool
    t_pred_cam: np.ndarray
    shadow_p_wc: np.ndarray
    bootstrap_applies: int


def unpack_host_result(f: np.ndarray) -> HostFrameResult:
    """Decode the packed (37,) result vector (see step_host_async)."""
    return HostFrameResult(
        p_wc=f[0:3], R_wc=f[3:12].reshape(3, 3), q_wb=f[12:16],
        v_w=f[16:19], rpy=f[19:22],
        is_keyframe=bool(f[22] > 0.5),
        num_matches=int(f[23]), num_inliers=int(f[24]),
        disparity=float(f[25]), used_fallback=bool(f[26] > 0.5),
        t_dir_cam=f[27:30], t_pred_cam=f[30:33],
        shadow_p_wc=f[33:36], bootstrap_applies=int(f[36]),
    )


class VIOEngine:
    """Thin host wrapper owning the static config + the jitted step."""

    def __init__(self, calib: CameraCalib, cfg: SystemConfig = SystemConfig(),
                 seed: int = 0):
        self.calib = calib
        self.cfg = cfg
        # Per-step keys are fold_in(base, step_counter): deterministic in the
        # frame index (matching the scan runner) so checkpoint/resume replays
        # the exact key sequence. The counter mirrors state.frame_idx and is
        # restored on resume (set_step_counter).
        self._base_key = jax.random.PRNGKey(seed)
        self._step_counter = 0
        self._packed_step = None     # built lazily by step_host
        self._pipelined_step = None  # built lazily by step_pipelined
        # Camera->body rotation from the calibration extrinsic. Kept as
        # NUMPY: closed-over values must embed as HLO literals — closed-over
        # jax DeviceArrays become captured buffers that the axon TPU runtime
        # re-uploads on every execution (measured ~5-15 ms per buffer).
        self.R_bc = np.asarray(calib.T_body_cam[:3, :3], np.float32)
        self._step = jax.jit(self._build_step())

    # ------------------------------------------------------------------ init
    def initialize(self, image0, q_wb0=None, v_w0=None, p_w0=None) -> EngineState:
        """First frame becomes the first keyframe (VISystem.cpp:149-153)."""
        img = jnp.asarray(image0, jnp.float32)
        feat0 = extract_features(img, self.cfg.frontend)
        q0 = jnp.asarray([1.0, 0, 0, 0] if q_wb0 is None else q_wb0, jnp.float32)
        v0 = jnp.zeros(3) if v_w0 is None else jnp.asarray(v_w0, jnp.float32)
        p0 = jnp.zeros(3) if p_w0 is None else jnp.asarray(p_w0, jnp.float32)
        R_wb0 = lie.quat_to_mat(q0)
        R_wc0 = R_wb0 @ self.R_bc
        return init_state(
            feat0, img, q0, v0, p0, R_wc0,
            window_size=self.cfg.backend.window_size,
            desc_dtype=jnp.dtype(self.cfg.backend.window_desc_dtype),
        )

    # ------------------------------------------------------------------ step
    def _build_step(self):
        cfg = self.cfg
        fe = cfg.frontend
        be = cfg.backend
        en = cfg.engine
        calib = self.calib
        fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
        R_bc = self.R_bc  # numpy: embeds as an HLO literal at trace time
        kf_rot_thresh = float(np.cos(np.deg2rad(en.kf_rotation_deg)))

        def step(state: EngineState, image, imu, imu_dt, gt_t_norm, key):
            # ---------------- inertial: orientation + preintegration
            gyro = imu[:, :3] - state.bias_g
            accel = imu[:, 3:] - state.bias_a
            q_wb, _ = madgwick_scan(state.q_wb, gyro, accel, imu_dt,
                                    beta=0.02, gravity=en.gravity)
            pre = preintegrate(imu[:, :3], imu[:, 3:], imu_dt,
                               bias_gyro=state.bias_g, bias_accel=state.bias_a)

            # Relative camera rotation since the last *keyframe*:
            # R_ji = R_wc_j^T R_wc_i  with R_wc = R_wb R_bc.
            R_wb_j = lie.quat_to_mat(q_wb)
            R_wc_j_imu = R_wb_j @ R_bc
            R_ji_imu = R_wc_j_imu.T @ state.kf_R_wc

            # ---------------- frontend
            feat = extract_features(image, fe)
            if fe.guided_gate_px > 0:
                # Guided matching: predict each keyframe keypoint's position
                # in the new frame under the IMU rotation (infinite-depth
                # homography K R K^-1) and gate candidates to a disc.
                x = (state.kf_feat.uv[:, 0] - cx) / fx
                y = (state.kf_feat.uv[:, 1] - cy) / fy
                rays_kf = jnp.stack([x, y, jnp.ones_like(x)], -1)
                warped = rays_kf @ R_ji_imu.T
                wz = jnp.where(jnp.abs(warped[:, 2]) > 1e-6, warped[:, 2], 1e-6)
                uv_pred = jnp.stack(
                    [warped[:, 0] / wz * fx + cx, warped[:, 1] / wz * fy + cy], -1
                )
                m = match_descriptors(
                    state.kf_feat.desc, state.kf_feat.mask, feat.desc, feat.mask,
                    uv_a=state.kf_feat.uv,
                    ratio=fe.ratio_thresh, mutual=fe.mutual_check,
                    uv_pred=uv_pred, uv_b=feat.uv,
                    gate_radius=fe.guided_gate_px,
                )
            else:
                m = match_descriptors(
                    state.kf_feat.desc, state.kf_feat.mask, feat.desc, feat.mask,
                    uv_a=state.kf_feat.uv,
                    ratio=fe.ratio_thresh, mutual=fe.mutual_check,
                    use_pallas=fe.use_pallas_matcher,
                )
            uv_i = state.kf_feat.uv
            uv_j = jnp.take(feat.uv, m.idx_b, axis=0)
            num_matches = jnp.sum(m.mask).astype(jnp.int32)
            # Solver mask: optionally restrict the epipolar solve to
            # fine-level (level-0) keyframe keypoints — coarse levels are
            # matching capacity, not solver-grade localization (see
            # FrontendConfig.solver_fine_only rationale).
            if fe.solver_fine_only and fe.levels_used > 1:
                solve_mask = m.mask & (state.kf_feat.level == 0)
            else:
                solve_mask = m.mask

            rays_i = unproject_pixels(uv_i, fx, fy, cx, cy)
            rays_j = unproject_pixels(uv_j, fx, fy, cx, cy)
            rays_i = rays_i / jnp.linalg.norm(rays_i, axis=-1, keepdims=True)
            rays_j = rays_j / jnp.linalg.norm(rays_j, axis=-1, keepdims=True)

            # IMU displacement prediction since the keyframe (needed both by
            # the scale section below and by the rescue-fallback's failure
            # detector). With an empty IMU window (vision-only datasets) the
            # integrated dt is 0; fall back to the camera frame period.
            T = jnp.where(pre.dt > 1e-6, pre.dt,
                          1.0 / max(calib.rate_cam_hz, 1.0))
            g_w = jnp.array([0.0, 0.0, -en.gravity], jnp.float32)
            # Attitude at the START of this IMU window (pre-update state).
            R_wb_prev = lie.quat_to_mat(state.q_wb)
            dp_step = state.v_w * T + 0.5 * g_w * T * T + R_wb_prev @ pre.dp
            # The epipolar translation spans keyframe -> current frame, so
            # the IMU scale must too: accumulate displacement since the kf.
            dp_since_kf = state.kf_dp_imu + dp_step
            imu_t_norm = jnp.linalg.norm(dp_since_kf)
            # IMU-predicted relative translation in frame-j coordinates
            # (t_ji = -R_cw_j dp_w): the direction the epipolar solve should
            # roughly agree with when the IMU state is healthy.
            t_pred_cam = -(R_wc_j_imu.T @ dp_since_kf)
            t_pred_dir = t_pred_cam / jnp.maximum(imu_t_norm, 1e-9)

            # ---------------- two-view relative pose
            used_fallback = jnp.asarray(False)
            if en.vision_rotation:
                # Vision-only mode (no IMU, e.g. KITTI): rotation AND
                # translation direction from the essential matrix (role of
                # the reference's EstimatePoseFeaturesRansac,
                # VISystem.cpp:1655-1794).
                est_e = ransac_essential(
                    rays_i, rays_j, solve_mask, key,
                    num_hyps=be.ransac_hyps, thresh=be.ransac_thresh,
                    uv_i=uv_i, dispersion_pow=be.ransac_dispersion_pow,
                )
                R_ji = est_e.R_ji
                t_dir = est_e.t_dir
                est_inliers = est_e.num_inliers
                est_inlier_mask = est_e.inlier_mask
            else:
                R_ji = R_ji_imu
                est = ransac_translation(
                    rays_i, rays_j, R_ji, solve_mask, key,
                    num_hyps=be.ransac_hyps, thresh=be.ransac_thresh,
                    uv_i=uv_i, dispersion_pow=be.ransac_dispersion_pow,
                )
                t_dir = resolve_direction_sign(
                    rays_i, rays_j, R_ji, est.t_dir, est.inlier_mask
                )
                est_inliers = est.num_inliers
                est_inlier_mask = est.inlier_mask

                if fe.guided_fallback_px > 0 and fe.guided_gate_px == 0:
                    # Rescue-only guided fallback: when the ungated solve is
                    # catastrophic (tracking about to be lost — repetitive
                    # texture flooding appearance matching with period-
                    # aliased pairs, or severe blur), re-match inside the
                    # IMU-rotation-predicted disc and take the gated solve
                    # on a decisive win. lax.cond: healthy frames never pay
                    # for the second match/solve. TWO triggers:
                    #   1. absolute inlier floor (tracking nearly lost);
                    #   2. failure-mode detector for period ALIASING: the
                    #      solved translation direction disagrees hard with
                    #      the IMU-predicted direction while the IMU says
                    #      the camera moved meaningfully. Aliased match sets
                    #      are epipolar-consistent with a WRONG translation,
                    #      so they pass RANSAC with healthy inlier counts —
                    #      an inlier floor cannot see them (measured:
                    #      repetitive scenes solve with ~26-85 inliers at
                    #      cos(angle to IMU) down to -0.2, while healthy
                    #      regimes sit at cos >= +0.7).
                    cos_est = jnp.dot(t_dir, t_pred_dir)
                    # The TRIGGER fires in every scale mode (round 4: it
                    # only decides whether the gated re-solve RUNS, which
                    # cannot corrupt anything by itself). The direction-
                    # improvement ACCEPTANCE channel below stays GT-scale
                    # only: in IMU-scale (GT-free) mode the IMU prediction
                    # is simultaneously the arbiter and the monocular scale
                    # source — accepting toward it closes a feedback loop
                    # that corrupts drifting runs (measured round 3: aggr3
                    # marg VI-BA 0.30 -> 1.13). GT-free triggers can still
                    # be rescued via the scale-decoupled inlier-win channel
                    # (the rotation-only gate never consults scale).
                    dir_trig = (
                        (imu_t_norm > fe.fallback_dir_min_norm)
                        & (cos_est < fe.fallback_dir_cos)
                    )
                    dir_accept_gt = dir_trig & (gt_t_norm >= 0.0)
                    triggered = (
                        (est_inliers < fe.fallback_trigger_inliers)
                        | dir_trig
                    ) & (jnp.sum(feat.mask) > 0)

                    def _gated_solve(_):
                        x = (state.kf_feat.uv[:, 0] - cx) / fx
                        y = (state.kf_feat.uv[:, 1] - cy) / fy
                        rk = jnp.stack([x, y, jnp.ones_like(x)], -1)
                        w = rk @ R_ji_imu.T
                        wz = jnp.where(jnp.abs(w[:, 2]) > 1e-6, w[:, 2], 1e-6)
                        uv_pred = jnp.stack(
                            [w[:, 0] / wz * fx + cx, w[:, 1] / wz * fy + cy],
                            -1,
                        )
                        m_g = match_descriptors(
                            state.kf_feat.desc, state.kf_feat.mask,
                            feat.desc, feat.mask, uv_a=state.kf_feat.uv,
                            ratio=fe.ratio_thresh, mutual=fe.mutual_check,
                            uv_pred=uv_pred, uv_b=feat.uv,
                            gate_radius=fe.guided_fallback_px,
                        )
                        uv_j_g = jnp.take(feat.uv, m_g.idx_b, axis=0)
                        rj_g = unproject_pixels(uv_j_g, fx, fy, cx, cy)
                        rj_g = rj_g / jnp.linalg.norm(rj_g, axis=-1,
                                                      keepdims=True)
                        if fe.solver_fine_only and fe.levels_used > 1:
                            g_solve_mask = m_g.mask & (
                                state.kf_feat.level == 0)
                        else:
                            g_solve_mask = m_g.mask
                        est_g = ransac_translation(
                            rays_i, rj_g, R_ji_imu, g_solve_mask,
                            jax.random.fold_in(key, 7),
                            num_hyps=be.ransac_hyps, thresh=be.ransac_thresh,
                            uv_i=uv_i,
                            dispersion_pow=be.ransac_dispersion_pow,
                        )
                        t_g = resolve_direction_sign(
                            rays_i, rj_g, R_ji_imu, est_g.t_dir,
                            est_g.inlier_mask,
                        )
                        # Acceptance: (a) decisive inlier win (the original
                        # tracking-lost rescue), or (b) on a direction
                        # trigger, the gated solve agrees with the IMU
                        # prediction decisively better at comparable
                        # support — aliasing suppressed without demanding a
                        # 1.5x inlier jump the gated match set cannot
                        # always deliver.
                        cos_g = jnp.dot(t_g, t_pred_dir)
                        better = (
                            est_g.num_inliers
                            > fe.fallback_win_margin * est_inliers
                        ) | (
                            dir_accept_gt
                            & (cos_g > cos_est + 0.15)
                            & (est_g.num_inliers
                               >= jnp.maximum(
                                   8, (0.7 * est_inliers).astype(jnp.int32)))
                        )

                        def sel(a, b):
                            return jnp.where(better, a, b)

                        return (sel(m_g.idx_b, m.idx_b), sel(m_g.mask, m.mask),
                                sel(uv_j_g, uv_j), sel(rj_g, rays_j),
                                sel(t_g, t_dir),
                                jnp.where(better, est_g.num_inliers,
                                          est_inliers),
                                sel(est_g.inlier_mask, est_inlier_mask),
                                better)

                    def _keep(_):
                        return (m.idx_b, m.mask, uv_j, rays_j, t_dir,
                                est_inliers, est_inlier_mask,
                                jnp.asarray(False))

                    (idx_b_s, mask_s, uv_j, rays_j, t_dir, est_inliers,
                     est_inlier_mask, used_fallback) = jax.lax.cond(
                        triggered, _gated_solve, _keep, None)
                    m = m._replace(idx_b=idx_b_s, mask=mask_s)
                    num_matches = jnp.sum(mask_s).astype(jnp.int32)

            disparity = rotation_compensated_disparity(
                uv_i, uv_j, m.mask, R_ji, fx, fy, cx, cy
            )

            # Compose this frame's preintegration onto the accumulated
            # keyframe->current factor (standard preintegration chaining
            # with bias-Jacobian propagation, frame-of-last-keyframe body
            # coords): feeds the VI-BA's inter-keyframe IMU factors — and
            # their bias-correction Jacobians — on promotion.
            acc = Preintegrated(
                dR=state.kf_pre_dR, dv=state.kf_pre_dv, dp=state.kf_pre_dp,
                dt=state.kf_time,
                J_dR_bg=state.kf_pre_J_R_bg, J_dv_bg=state.kf_pre_J_v_bg,
                J_dv_ba=state.kf_pre_J_v_ba, J_dp_bg=state.kf_pre_J_p_bg,
                J_dp_ba=state.kf_pre_J_p_ba,
            )
            pre_acc = compose(acc, pre, dt_b=T)
            pre_acc = pre_acc._replace(dR=lie.orthonormalize(pre_acc.dR))

            # Rolling gyro + accel bias recalibration on quasi-static frames
            # (role of /root/reference/src/Imu.cpp:423-428 and the gravity-
            # removal accel calibration of Imu.cpp:125-163, made in-run).
            # Stillness detection is variance-based within this frame's IMU
            # window (invariant to the bias itself); a magnitude bound on
            # the de-biased mean rate rejects constant-rate rotation. The
            # accumulated factor is first-order re-corrected so its
            # linearization point tracks the updated biases.
            bias_g_new = state.bias_g
            bias_a_new = state.bias_a
            if en.gyro_recalib and not en.vision_rotation:
                w_raw = imu[:, :3]
                a_raw = imu[:, 3:]
                validw = (imu_dt > 0).astype(jnp.float32)[:, None]
                n = jnp.sum(validw)
                nf = jnp.maximum(n, 1.0)
                w_mean = jnp.sum(w_raw * validw, 0) / nf
                w_std = jnp.sqrt(jnp.maximum(
                    jnp.sum((w_raw - w_mean) ** 2 * validw, 0) / nf, 0.0))
                a_mean = jnp.sum(a_raw * validw, 0) / nf
                a_std = jnp.sqrt(jnp.maximum(
                    jnp.sum((a_raw - a_mean) ** 2 * validw, 0) / nf, 0.0))
                a_dev = jnp.abs(jnp.linalg.norm(a_mean) - en.gravity)
                still = (
                    (n >= 4.0)
                    & (jnp.max(w_std) < en.recalib_gyro_std)
                    & (jnp.max(a_std) < en.recalib_accel_std)
                    & (a_dev < en.recalib_accel_dev)
                    & (jnp.linalg.norm(w_mean - state.bias_g) < 0.05)
                )
                dbg = jnp.where(
                    still, en.recalib_alpha * (w_mean - state.bias_g), 0.0
                )
                bias_g_new = state.bias_g + dbg
                # Gravity-anchored accel-bias EMA (round 3): at stillness
                # the accelerometer should read the reaction to gravity in
                # body coords, R_wb^T (0,0,+g); the residual of the window
                # mean against that is the accel bias. Uses the filter
                # attitude (gravity-converged at stillness); a magnitude
                # bound rejects gross attitude errors. Alpha below the gyro
                # one — a roll/pitch error of e radians aliases g*e into
                # this estimate.
                dba = jnp.zeros(3, jnp.float32)
                if en.accel_recalib:
                    f_exp = R_wb_j.T @ (-g_w)     # (0,0,+g) in body coords
                    ba_target = a_mean - f_exp
                    ba_ok = still & (
                        jnp.linalg.norm(ba_target - state.bias_a) < 0.5)
                    dba = jnp.where(
                        ba_ok,
                        en.recalib_accel_alpha * (ba_target - state.bias_a),
                        0.0)
                    bias_a_new = state.bias_a + dba
                pre_acc = bias_correct(pre_acc, dbg, dba)
            pre_dR_acc, pre_dv_acc, pre_dp_acc = (
                pre_acc.dR, pre_acc.dv, pre_acc.dp
            )
            # Scale: GT norm (reference setGtRes parity, VISystem.cpp:415-419)
            # or IMU preintegration prediction in VI mode. BOOTSTRAP PHASE
            # (round 4, open-loop GT-free only): before the VI alignment has
            # fired, the per-step IMU scale is a function of the (possibly
            # cold/corrupt) velocity state — each step differently wrong, so
            # the window is not consistently scaled and the alignment's
            # global-scale model cannot fit (measured: fitted scale NEGATIVE
            # until ~frame 21 on gentle cold starts). Instead the scale
            # CHAINS through the triangulated keyframe depths (classical
            # relative-scale propagation): depth of a re-observed landmark
            # scales linearly with the baseline, so s = median(stored_depth
            # / unit-baseline depth) keeps the whole pre-alignment
            # trajectory consistent up to ONE global factor — exactly what
            # the alignment then fixes.
            # Round 5: the chain runs under VI-BA too (VERDICT #1) — the
            # shadow supervision is composed with the default GT-free mode
            # via the scale-disagreement trigger in engine/bootstrap.py.
            chain_static = (en.vi_align_bootstrap and not en.vision_rotation)
            s_shadow = imu_t_norm
            d_j_u = None
            chain_pair_ok = None
            if chain_static:
                from vislam_tpu.backend.triangulate import (
                    triangulate_midpoint as _tri_chain,
                )

                _, d_i_u, d_j_u, gap_u = _tri_chain(rays_i, rays_j, R_ji,
                                                    t_dir)
                chain_pair_ok = (
                    m.mask & est_inlier_mask
                    & (d_i_u > 1e-3) & (d_j_u > 1e-3)
                    & (gap_u < 0.08 * d_i_u)
                    & jnp.isfinite(d_i_u) & jnp.isfinite(d_j_u)
                )
                ok_ratio = chain_pair_ok & state.kf_depth_valid
                ratio = state.kf_depths / jnp.maximum(d_i_u, 1e-6)
                s_med = jnp.nanmedian(jnp.where(ok_ratio, ratio, jnp.nan))
                s_chain_ok = (
                    (jnp.sum(ok_ratio) >= 12) & jnp.isfinite(s_med)
                    & (s_med > 1e-4) & (s_med < 1e4)
                )
                # Fallback for a broken chain: the PREVIOUS chained step
                # length (consecutive 20 Hz steps have similar lengths) —
                # never the per-step IMU scale, which is the corrupt
                # quantity on a cold start; its garbage values are what
                # made the round-4 first shadow attempt inconsistent
                # (measured: fitted scale still negative). An UNSEEDED
                # chain (shadow_scale == 0, first solved step) seeds the
                # GLOBAL shadow scale once from the clipped IMU prediction
                # (advisor round 4): only the global factor comes from the
                # IMU — the fit's s absorbs any error in it — and seeding
                # near the true step length keeps s near 1 on platforms
                # whose step length is far from any fixed constant.
                s_unseeded = jnp.clip(imu_t_norm, 0.005, 0.5)
                s_fallback = jnp.where(state.shadow_scale > 0.0,
                                       state.shadow_scale, s_unseeded)
                s_shadow = jnp.where(s_chain_ok, s_med, s_fallback)
            scale = jnp.where(gt_t_norm >= 0.0, gt_t_norm, imu_t_norm)
            t_ji = t_dir * scale  # frame-j coords: X_j = R_ji X_i + t_ji
            dp_world = dp_step  # single-frame prediction for the fallbacks

            if en.photometric_refine:
                # Direct intensity refinement of (R_ji, t_ji) — the role of
                # the reference's EstimatePoseFeatures GN
                # (VISystem.cpp:1113-1448) as a post-RANSAC polish: depths
                # from triangulating the inlier matches, coarse-to-fine
                # alignment on the pyramid, guarded acceptance.
                from vislam_tpu.backend.photometric import photometric_align
                from vislam_tpu.backend.triangulate import triangulate_midpoint
                from vislam_tpu.frontend.pyramid import build_pyramid

                kf_pyr = build_pyramid(state.kf_image, fe.num_levels)
                cur_pyr = build_pyramid(image, fe.num_levels)
                X_i3, d_i, d_j, gap = triangulate_midpoint(
                    rays_i, rays_j, R_ji, t_ji
                )
                pts_ok = (
                    est_inlier_mask & (d_i > be.min_depth) & (d_i < be.max_depth)
                    & (d_j > be.min_depth) & (gap < 0.05 * d_i)
                )
                depths = d_i * rays_i[:, 2]  # z-depth of kf pixel
                pres = photometric_align(
                    kf_pyr, cur_pyr, uv_i, depths, pts_ok,
                    R_ji, t_ji, fx, fy, cx, cy,
                    levels=(2, 1, 0), iters_per_level=5,
                )
                # Guarded acceptance: finite, enough points, small deviation.
                drot = jnp.linalg.norm(lie.so3_log(pres.R @ R_ji.T))
                dt_rel = jnp.linalg.norm(pres.t - t_ji) / jnp.maximum(scale, 1e-6)
                ok_ref = (
                    jnp.all(jnp.isfinite(pres.t)) & jnp.all(jnp.isfinite(pres.R))
                    & (pres.num_valid >= 30) & (drot < 0.05) & (dt_rel < 0.5)
                )
                R_ji = jnp.where(ok_ref, lie.orthonormalize(pres.R), R_ji)
                # Keep the scale pinned (GT/IMU), take the refined direction.
                t_ref_n = jnp.linalg.norm(pres.t)
                t_ref_dir = pres.t / jnp.maximum(t_ref_n, 1e-9)
                t_ji = jnp.where(ok_ref, t_ref_dir * scale, t_ji)

            # ---------------- relative pose -> world pose
            # T_cw_j = [R_ji | t_ji] ∘ T_cw_i; invert to camera-to-world.
            R_cw_i = state.kf_R_wc.T
            t_cw_i = -state.kf_R_wc.T @ state.kf_p_wc
            R_cw_j = R_ji @ R_cw_i
            t_cw_j = R_ji @ t_cw_i + t_ji
            # Re-orthonormalize: the composition above contains
            # kf_R_wc @ kf_R_wc^T, which DOUBLES any orthogonality error of
            # the anchor every keyframe — unchecked, the pose state diverges
            # exponentially after ~25 keyframes (measured).
            R_wc_j = lie.orthonormalize(R_cw_j.T)
            p_wc_j = -R_cw_j.T @ t_cw_j

            # Solution quality gate (reference skips frames with too few
            # matches, VISystem.cpp:297): keep IMU-only pose when weak.
            # Denominator = FINE-level (level-0) keyframe keypoints only:
            # coarse levels are extra capacity with an intrinsically lower
            # per-keypoint match rate (cross-octave duplicates die in the
            # ratio test), so counting them starves the gate — measured:
            # the multi-scale default cut keyframe promotions 40 -> 9 on the
            # loop oracle with the all-levels denominator. Level-0-only
            # keeps the gate's round-2 semantics exactly.
            kf_valid_fine = jnp.sum(
                state.kf_feat.mask & (state.kf_feat.level == 0))
            enough = num_matches >= jnp.maximum(
                (en.min_feature_ratio * kf_valid_fine).astype(jnp.int32),
                8,
            )
            solved = enough & (est_inliers >= 8)
            R_wc_j = jnp.where(solved, R_wc_j, R_wc_j_imu)
            # IMU fallback uses the displacement accumulated since the
            # keyframe (single-step dp froze the pose during visual outages).
            p_wc_j = jnp.where(
                solved, p_wc_j, state.kf_p_wc + dp_since_kf
            )

            # ---------------- keyframe policy (automatic thresholds)
            rot_cos = 0.5 * (jnp.trace(R_ji) - 1.0)
            is_kf = solved & (
                (disparity > en.kf_disparity_px) | (rot_cos < kf_rot_thresh)
            )

            # ---------------- state update. The PROMOTION machinery —
            # window roll + slot writes across ~25 fields, keyframe
            # feature/image swap, depth-chain + shadow-window writes —
            # executes behind ONE lax.cond on is_kf (round 5). The old
            # where-gated formulation paid the full roll/copy chain on
            # EVERY frame; the op census measured 1305 executed HLO ops
            # per trip at ~1.45 us/op with nearly half of them
            # copies/GTEs around this machinery, and the step is
            # OP-COUNT-bound on this runtime (time flat in image size,
            # f32 == bf16; BENCH_NOTES round 5). Under jax.vmap (batch
            # runners) cond lowers to a both-branches select — identical
            # cost to the old formulation there, no regression. The
            # per-branch math is UNCHANGED (same ops, same order), so
            # results are bit-identical to the where() version.
            sel = lambda a, b: jnp.where(is_kf, a, b)
            win = state.window
            Wn = win.uv.shape[0]
            full = win.count >= Wn
            slot = jnp.minimum(win.count, Wn - 1)
            R_cw_new = R_wc_j.T
            t_cw_new = -R_wc_j.T @ p_wc_j
            # The promoted keyframe's IMU factor = preintegration
            # accumulated since the previous keyframe (valid only if the
            # interval really integrated IMU data — vision-only datasets
            # keep dt at 0).
            t_since_kf_now = state.kf_time + T
            t_since_kf = t_since_kf_now

            # Velocity: from world displacement over the window (solved),
            # else IMU propagation. Vision velocity: displacement since the
            # last keyframe over the TIME since that keyframe (state.kf_time
            # accumulates it; using the single-frame dt here was a measured
            # 2-3x overestimate).
            v_vis = (p_wc_j - state.kf_p_wc) / jnp.maximum(t_since_kf, 1e-3)
            v_imu = state.v_w + g_w * T + (R_wb_prev @ pre.dv)
            # IMU-scale mode (gt_t_norm < 0): the monocular scale comes from
            # the velocity state, so the velocity must NOT be re-estimated
            # from the (IMU-scaled) vision displacement — that feedback
            # collapses scale to zero (measured path ratio 0.069). Propagate
            # inertially; the linear VI alignment (engine/bootstrap.py)
            # re-anchors the velocity state once the window supports it, and
            # the VI-BA refines it thereafter.
            v_new = jnp.where(solved & (gt_t_norm >= 0), v_vis, v_imu)
            # Rate limit + physical clamp: anchor refinements jitter the
            # vision velocity; unbounded it feeds a position runaway.
            dv_max = 20.0 * jnp.maximum(T, 1e-3)  # <= 20 m/s^2 equivalent
            v_new = state.v_w + jnp.clip(v_new - state.v_w, -dv_max, dv_max)
            v_new = jnp.clip(v_new, -en.max_velocity, en.max_velocity)

            if en.vision_rotation:
                # Attitude follows the vision pose in IMU-less mode (the
                # filter has nothing to integrate).
                q_wb = jnp.where(
                    solved,
                    lie.mat_to_quat(lie.orthonormalize(R_wc_j @ R_bc.T)),
                    q_wb,
                )

            # SHADOW position advances every frame (chain-scaled when the
            # solve succeeded); the window/depth writes happen only on
            # promotion, inside the cond below.
            shadow_p_j = state.shadow_kf_p_wc + dp_since_kf
            if chain_static:
                t_cw_i_sh = -R_cw_i @ state.shadow_kf_p_wc
                t_cw_j_sh = R_ji @ t_cw_i_sh + t_dir * s_shadow
                shadow_p_j = jnp.where(
                    solved, -R_cw_j.T @ t_cw_j_sh,
                    state.shadow_kf_p_wc + dp_since_kf)

            def _promote(_):
                def roll_if_full(x):
                    return jnp.where(full, jnp.roll(x, -1, axis=0), x)

                rolled = win._replace(
                    uv=roll_if_full(win.uv),
                    desc=roll_if_full(win.desc),
                    kp_mask=roll_if_full(win.kp_mask),
                    R_cw=roll_if_full(win.R_cw),
                    t_cw=roll_if_full(win.t_cw),
                    valid=roll_if_full(win.valid),
                    v_w=roll_if_full(win.v_w),
                    imu_dR=roll_if_full(win.imu_dR),
                    imu_dv=roll_if_full(win.imu_dv),
                    imu_dp=roll_if_full(win.imu_dp),
                    imu_dt=roll_if_full(win.imu_dt),
                    imu_J_R_bg=roll_if_full(win.imu_J_R_bg),
                    imu_J_v_bg=roll_if_full(win.imu_J_v_bg),
                    imu_J_v_ba=roll_if_full(win.imu_J_v_ba),
                    imu_J_p_bg=roll_if_full(win.imu_J_p_bg),
                    imu_J_p_ba=roll_if_full(win.imu_J_p_ba),
                    imu_bg_ref=roll_if_full(win.imu_bg_ref),
                    imu_ba_ref=roll_if_full(win.imu_ba_ref),
                    # Slot 0's stored factor points at the keyframe just
                    # evicted — it is meaningless after a roll.
                    imu_valid=roll_if_full(win.imu_valid).at[0].set(
                        jnp.where(full, False, win.imu_valid[0])
                    ),
                )
                updated = rolled._replace(
                    uv=rolled.uv.at[slot].set(feat.uv),
                    desc=rolled.desc.at[slot].set(
                        feat.desc.astype(rolled.desc.dtype)),
                    kp_mask=rolled.kp_mask.at[slot].set(feat.mask),
                    R_cw=rolled.R_cw.at[slot].set(R_cw_new),
                    t_cw=rolled.t_cw.at[slot].set(t_cw_new),
                    valid=rolled.valid.at[slot].set(True),
                    count=jnp.minimum(win.count + 1, Wn),
                    # Keyframe velocity lands in the window on promotion.
                    v_w=rolled.v_w.at[slot].set(v_new),
                    imu_dR=rolled.imu_dR.at[slot].set(pre_dR_acc),
                    imu_dv=rolled.imu_dv.at[slot].set(pre_dv_acc),
                    imu_dp=rolled.imu_dp.at[slot].set(pre_dp_acc),
                    imu_dt=rolled.imu_dt.at[slot].set(t_since_kf_now),
                    imu_valid=rolled.imu_valid.at[slot].set(
                        (pre.dt > 1e-6) & (slot > 0)
                    ),
                    imu_J_R_bg=rolled.imu_J_R_bg.at[slot].set(
                        pre_acc.J_dR_bg),
                    imu_J_v_bg=rolled.imu_J_v_bg.at[slot].set(
                        pre_acc.J_dv_bg),
                    imu_J_v_ba=rolled.imu_J_v_ba.at[slot].set(
                        pre_acc.J_dv_ba),
                    imu_J_p_bg=rolled.imu_J_p_bg.at[slot].set(
                        pre_acc.J_dp_bg),
                    imu_J_p_ba=rolled.imu_J_p_ba.at[slot].set(
                        pre_acc.J_dp_ba),
                    imu_bg_ref=rolled.imu_bg_ref.at[slot].set(bias_g_new),
                    imu_ba_ref=rolled.imu_ba_ref.at[slot].set(bias_a_new),
                )
                if chain_static:
                    # Promoted keyframe: each matched landmark's depth in
                    # the NEW keyframe camera = unit-baseline depth x the
                    # SHADOW step scale, written at the new keypoint's row
                    # via a one-hot reduction (no scatter).
                    K_kp = state.kf_feat.uv.shape[0]
                    tgt = m.idx_b
                    oh = (tgt[:, None] == jnp.arange(K_kp)[None, :]) \
                        & chain_pair_ok[:, None]
                    depth_new = jnp.max(
                        jnp.where(oh, (d_j_u * s_shadow)[:, None], 0.0),
                        axis=0)
                    valid_new = jnp.any(oh, axis=0) & (depth_new > 1e-6)
                    rolled_shadow = jnp.where(
                        full, jnp.roll(state.shadow_win_p, -1, axis=0),
                        state.shadow_win_p)
                    shadow_win2 = rolled_shadow.at[slot].set(shadow_p_j)
                else:
                    depth_new = state.kf_depths
                    valid_new = state.kf_depth_valid
                    shadow_win2 = state.shadow_win_p
                return (updated, feat, depth_new, valid_new, shadow_win2)

            def _keep(_):
                return (win, state.kf_feat, state.kf_depths,
                        state.kf_depth_valid, state.shadow_win_p)

            (new_window, new_kf_feat, new_kf_depths, new_kf_depth_valid,
             new_shadow_win) = jax.lax.cond(is_kf, _promote, _keep, None)
            # kf_image feeds ONLY the photometric refine; when that is off
            # (default) the carry value is never consumed, so skipping the
            # write lets XLA alias the 1.4 MB buffer through the scan.
            if en.photometric_refine:
                new_kf_image = jnp.where(is_kf, image, state.kf_image)
            else:
                new_kf_image = state.kf_image
            zero33 = jnp.zeros((3, 3), jnp.float32)
            new_state = EngineState(
                q_wb=q_wb,
                v_w=v_new,
                bias_g=bias_g_new,
                bias_a=bias_a_new,
                R_wc=jnp.where(solved, R_wc_j, R_wc_j_imu),
                p_wc=p_wc_j,
                kf_R_wc=sel(R_wc_j, state.kf_R_wc),
                kf_p_wc=sel(p_wc_j, state.kf_p_wc),
                kf_feat=new_kf_feat,
                kf_image=new_kf_image,
                window=new_window,
                frame_idx=state.frame_idx + 1,
                kf_count=state.kf_count + is_kf.astype(jnp.int32),
                kf_time=jnp.where(is_kf, 0.0, t_since_kf),
                kf_dp_imu=jnp.where(is_kf, jnp.zeros(3), dp_since_kf),
                kf_pre_dR=jnp.where(is_kf, jnp.eye(3, dtype=jnp.float32),
                                    pre_dR_acc),
                kf_pre_dv=jnp.where(is_kf, jnp.zeros(3), pre_dv_acc),
                kf_pre_dp=jnp.where(is_kf, jnp.zeros(3), pre_dp_acc),
                kf_pre_J_R_bg=jnp.where(is_kf, zero33, pre_acc.J_dR_bg),
                kf_pre_J_v_bg=jnp.where(is_kf, zero33, pre_acc.J_dv_bg),
                kf_pre_J_v_ba=jnp.where(is_kf, zero33, pre_acc.J_dv_ba),
                kf_pre_J_p_bg=jnp.where(is_kf, zero33, pre_acc.J_dp_bg),
                kf_pre_J_p_ba=jnp.where(is_kf, zero33, pre_acc.J_dp_ba),
                # Marginalization-prior handoff: when this promotion evicts
                # the oldest keyframe (window roll), the pending prior the
                # last BA computed for the pre-roll slot 1 now targets slot
                # 0. Pending is cleared so a stale prior can never be
                # installed twice.
                marg_H=jnp.where(is_kf & full, state.marg_pend_H,
                                 state.marg_H),
                marg_R_cw=jnp.where(is_kf & full, state.marg_pend_R_cw,
                                    state.marg_R_cw),
                marg_t_cw=jnp.where(is_kf & full, state.marg_pend_t_cw,
                                    state.marg_t_cw),
                marg_v=jnp.where(is_kf & full, state.marg_pend_v,
                                 state.marg_v),
                marg_pend_H=jnp.where(is_kf & full,
                                      jnp.zeros((9, 9), jnp.float32),
                                      state.marg_pend_H),
                marg_pend_R_cw=state.marg_pend_R_cw,
                marg_pend_t_cw=state.marg_pend_t_cw,
                marg_pend_v=state.marg_pend_v,
                # vi_aligned == "the trajectory scale is trusted/metric".
                # GT-scale steps are metric by construction, so they latch
                # it — this is what keeps the two-phase VI-BA gating
                # (engine/refine.py masks IMU factors on ~vi_aligned) a
                # no-op for GT-scale runs.
                vi_aligned=state.vi_aligned | (gt_t_norm >= 0.0),
                # Engagement latch: GT-scale steps are metric by
                # construction; under VI-BA the promotion-count DEADLINE
                # also engages (a run whose healthy latch never fires —
                # drifting IMU bias — must still hand scale/velocity to
                # the full estimator, whose online bias states are the
                # cure; post-deadline supervision then drops to the
                # decisive-only gate like any engaged run).
                vi_engaged=state.vi_engaged | (gt_t_norm >= 0.0) | (
                    (state.kf_count + is_kf.astype(jnp.int32)
                     > be.vi_two_phase_max_kfs)
                    if be.vi_factors else False),
                kf_depths=new_kf_depths,
                kf_depth_valid=new_kf_depth_valid,
                shadow_win_p=new_shadow_win,
                shadow_p_wc=shadow_p_j,
                shadow_kf_p_wc=jnp.where(is_kf, shadow_p_j,
                                         state.shadow_kf_p_wc),
                shadow_scale=jnp.where(
                    solved, jnp.clip(s_shadow, 1e-4, 1e4),
                    state.shadow_scale),
                origin_p_wc=state.origin_p_wc,
                shadow_origin_p=state.shadow_origin_p,
                bootstrap_applies=state.bootstrap_applies,
            )
            if en.vi_align_bootstrap and not en.vision_rotation:
                # GT-free bootstrap/supervision: once enough preintegrated
                # factors are in the window (IMU-scale mode), the linear
                # visual-inertial alignment re-anchors scale/velocities
                # (engine/bootstrap.py). Under VI-BA (round 5, VERDICT #1)
                # the composition is TWO-PHASE: until the healthy latch the
                # window BA runs VISION-ONLY (engine/refine.py masks the
                # IMU factors on ~vi_aligned), so this kinematic trigger
                # stays valid — the round-3 failure was the trigger
                # fighting a live VI-BA's vision/IMU balance (gentle warm
                # 0.35 -> 0.90). After the latch the full VI-BA owns
                # scale/velocity and the supervision stops (need_align
                # below). The re-anchor runs BEFORE the in-step refine
                # cond, so the next BA solve starts from corrected
                # geometry.
                from vislam_tpu.engine.bootstrap import vi_align_window

                # Round 4: the alignment SUPERVISES the whole open-loop
                # run — no latch gates the cond. A healthy state is a
                # bit-exact no-op (the model comparison only applies on
                # measured inconsistency), and post-alignment velocity
                # error re-grows in open loop (measured r_cur 0.003 ->
                # 0.023 over ~10 frames after a cold-start re-anchor), so
                # later re-fires keep re-anchoring. vi_aligned remains a
                # DIAGNOSTIC latch (first healthy determination).
                need_align = (
                    is_kf & (gt_t_norm < 0.0)
                    & (jnp.sum(new_state.window.imu_valid)
                       >= en.vi_align_min_factors)
                )
                if be.vi_factors:
                    # Two-phase hand-off: once the VI-BA is engaged
                    # (vi_engaged: healthy + engagement excitation, the
                    # promotion-count deadline, or a GT-scale step), it
                    # owns scale and velocities; continuous supervision
                    # there would re-balance what the optimizer just
                    # balanced (the round-3 failure mode, re-confirmed by
                    # the falsified post-engagement-apply variants — see
                    # bootstrap.py). Phase 1 supervises with the SAME
                    # full-then-velocity-only semantics as open loop.
                    need_align = need_align & (~new_state.vi_engaged)
                new_state = jax.lax.cond(
                    need_align,
                    lambda s: vi_align_window(
                        s, R_bc, en.gravity,
                        min_factors=en.vi_align_min_factors,
                        min_excitation=en.vi_align_min_excitation,
                        engage_min_excitation=en.vi_engage_min_excitation),
                    lambda s: s,
                    new_state,
                )
            if be.refine_in_step:
                # In-step windowed (V)I-BA: the refine program joins this
                # step's XLA graph behind a cond, executing only on keyframe
                # promotion. This is what lets the offline scan runner do
                # full SLAM (including BA) as one device program.
                from vislam_tpu.engine.refine import refine_window

                refine_now = is_kf
                if be.refine_stride > 1:
                    refine_now = is_kf & (
                        new_state.kf_count % be.refine_stride == 0)
                new_state = jax.lax.cond(
                    refine_now,
                    lambda s: refine_window(s, cfg, fx, fy, cx, cy, R_bc=R_bc),
                    lambda s: s,
                    new_state,
                )

            result = FrameResult(
                p_wc=new_state.p_wc if be.refine_in_step else p_wc_j,
                R_wc=new_state.R_wc if be.refine_in_step else R_wc_j,
                q_wb=q_wb,
                v_w=new_state.v_w if be.refine_in_step else v_new,
                is_keyframe=is_kf,
                num_matches=num_matches,
                num_inliers=est_inliers,
                disparity=disparity,
                t_dir_cam=t_dir,
                used_fallback=used_fallback,
                t_pred_cam=t_pred_cam,
            )
            return new_state, result

        return step

    def set_step_counter(self, n: int) -> None:
        """Restore the per-step key counter (= state.frame_idx) on resume."""
        self._step_counter = int(n)

    def relocalize(self, state: EngineState, image, R_wc, p_wc) -> EngineState:
        """Re-anchor tracking at a relocalized pose (backend/reloc.py).

        Semantics: relocalization = restarting tracking from a known map
        pose. The current image becomes the new first keyframe, the window
        restarts (its old contents are pre-outage and inconsistent with the
        corrected pose), and the calibrated IMU biases + velocity carry over.
        """
        img = jnp.asarray(image, jnp.float32)
        feat = extract_features(img, self.cfg.frontend)
        R_wc = jnp.asarray(R_wc, jnp.float32)
        p_wc = jnp.asarray(p_wc, jnp.float32)
        R_wb = R_wc @ jnp.asarray(self.R_bc, jnp.float32).T
        q_wb = lie.mat_to_quat(R_wb)
        # Sanitize the carried-over dynamics: relocalize is also the
        # divergence-recovery path, where velocity/bias may be the very
        # thing that went non-finite.
        v_w = jnp.where(jnp.isfinite(state.v_w), state.v_w, 0.0)
        bias_g = jnp.where(jnp.isfinite(state.bias_g), state.bias_g, 0.0)
        bias_a = jnp.where(jnp.isfinite(state.bias_a), state.bias_a, 0.0)
        new = init_state(
            feat, img, q_wb, v_w, p_wc, R_wc,
            bias_g=bias_g, bias_a=bias_a,
            window_size=self.cfg.backend.window_size,
            desc_dtype=jnp.dtype(self.cfg.backend.window_desc_dtype),
        )
        return new._replace(frame_idx=state.frame_idx,
                            kf_count=state.kf_count + 1)

    def step(self, state: EngineState, image, imu, imu_dt,
             gt_t_norm: float = -1.0):
        """Process one frame. gt_t_norm < 0 selects IMU (VI) scale."""
        sub = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        return self._step(
            state,
            jnp.asarray(image, jnp.float32),
            jnp.asarray(imu, jnp.float32),
            jnp.asarray(imu_dt, jnp.float32),
            jnp.asarray(gt_t_norm, jnp.float32),
            sub,
        )

    def step_host_async(self, state: EngineState, image, imu, imu_dt,
                        gt_t_norm: float = -1.0):
        """Dispatch one frame WITHOUT fetching: (new_state, packed_device).

        packed_device is the (37,) result vector still on device; decode it
        later (possibly from a fetch thread) with `unpack_host_result
        (np.asarray(packed_device))`. This is what lets the CLI host loop
        PIPELINE: dispatch frame j+1 while frame j's single result fetch
        (~25 ms tunnel RTT) is in flight — the fetch no longer serializes
        the loop. new_state stays on device."""
        if self._packed_step is None:
            base = self._build_step()

            def packed(state, image, imu, imu_dt, gt_t_norm, key):
                # Accept any image dtype (uint8 datasets upload 4x fewer
                # bytes over the ~25 MB/s tunnel); compute path is f32.
                image = image.astype(jnp.float32)
                s, r = base(state, image, imu, imu_dt, gt_t_norm, key)
                flat = jnp.concatenate([
                    r.p_wc, r.R_wc.reshape(-1), r.q_wb, r.v_w,
                    lie.quat_to_rpy(r.q_wb),
                    jnp.stack([
                        r.is_keyframe.astype(jnp.float32),
                        r.num_matches.astype(jnp.float32),
                        r.num_inliers.astype(jnp.float32),
                        r.disparity,
                        r.used_fallback.astype(jnp.float32),
                    ]),
                    r.t_dir_cam, r.t_pred_cam,
                    # Round 5: shadow position + bootstrap apply count ride
                    # along so the host can retro-smooth the bootstrap
                    # prefix (eval/smooth.py) without extra fetches.
                    s.shadow_p_wc,
                    s.bootstrap_applies.astype(jnp.float32)[None],
                ])
                return s, flat

            self._packed_step = jax.jit(packed)
        sub = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        return self._packed_step(
            state,
            jnp.asarray(image),
            jnp.asarray(imu, jnp.float32),
            jnp.asarray(imu_dt, jnp.float32),
            jnp.asarray(gt_t_norm, jnp.float32),
            sub,
        )

    def step_host(self, state: EngineState, image, imu, imu_dt,
                  gt_t_norm: float = -1.0):
        """Process one frame for a HOST loop: (new_state, HostFrameResult).

        The result crosses the device boundary as one packed (37,) vector —
        a single ~25 ms tunnel fetch instead of one per leaf; rpy is
        computed on-device so the host never round-trips a quaternion."""
        new_state, flat = self.step_host_async(state, image, imu, imu_dt,
                                               gt_t_norm)
        return new_state, unpack_host_result(np.asarray(flat))

    def step_pipelined(self, state: EngineState, kf_gt_pos, image, imu,
                       imu_dt, gt_p, gt_on: float):
        """Fully-async host-loop step: (new_state, new_kf_gt_pos, packed).

        Removes the LAST host feedback of the online loop: in GT-scale mode
        gt_t_norm = ||gt_p - gt_p(last keyframe)|| depends on which frame
        was last promoted — host code would have to fetch is_keyframe
        before dispatching the next frame. Here the last-keyframe GT
        position rides a device-side carry (exactly the scan runner's
        trick, engine/batch.py::_scan_fn), so the CLI can dispatch frame
        j+1 immediately and decode frame j's packed result from a fetch
        thread ~2 frames later. gt_on <= 0 selects IMU scale (gt_norm=-1),
        matching step(gt_t_norm=-1)."""
        if self._pipelined_step is None:
            base = self._build_step()

            def piped(state, kf_gt_pos, image, imu, imu_dt, gt_p, gt_on,
                      key):
                image = image.astype(jnp.float32)
                gt_norm = jnp.where(
                    gt_on > 0.0,
                    jnp.linalg.norm(gt_p - kf_gt_pos),
                    jnp.float32(-1.0),
                )
                s, r = base(state, image, imu, imu_dt, gt_norm, key)
                new_kf_gt = jnp.where(r.is_keyframe, gt_p, kf_gt_pos)
                flat = jnp.concatenate([
                    r.p_wc, r.R_wc.reshape(-1), r.q_wb, r.v_w,
                    lie.quat_to_rpy(r.q_wb),
                    jnp.stack([
                        r.is_keyframe.astype(jnp.float32),
                        r.num_matches.astype(jnp.float32),
                        r.num_inliers.astype(jnp.float32),
                        r.disparity,
                        r.used_fallback.astype(jnp.float32),
                    ]),
                    r.t_dir_cam, r.t_pred_cam,
                    # Round 5: shadow position + bootstrap apply count ride
                    # along so the host can retro-smooth the bootstrap
                    # prefix (eval/smooth.py) without extra fetches.
                    s.shadow_p_wc,
                    s.bootstrap_applies.astype(jnp.float32)[None],
                ])
                return s, new_kf_gt, flat

            self._pipelined_step = jax.jit(piped)
        sub = jax.random.fold_in(self._base_key, self._step_counter)
        self._step_counter += 1
        return self._pipelined_step(
            state,
            jnp.asarray(kf_gt_pos, jnp.float32),
            jnp.asarray(image),
            jnp.asarray(imu, jnp.float32),
            jnp.asarray(imu_dt, jnp.float32),
            jnp.asarray(gt_p, jnp.float32),
            jnp.asarray(gt_on, jnp.float32),
            sub,
        )
