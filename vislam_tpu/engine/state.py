"""Engine state pytrees.

Role of the reference VISystem's scattered mutable members — pose state
(include/VISystem.hpp:81-108: positionCam/qOrientationCam/velocityCam...),
the keyframe ring buffer (Camera::frameList + FreeLastFrame,
/root/reference/src/VISystem.cpp:408-412), and the IMU core state — as one
immutable fixed-shape pytree threaded through the jitted step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from vislam_tpu.frontend.features import Features


class KeyframeWindow(NamedTuple):
    """Fixed-size rolling keyframe window (newest at slot `count-1` when not
    yet full; once full, slots roll left on each promotion — the reference's
    FIFO eviction with static shapes)."""

    uv: jnp.ndarray       # (W, K, 2)
    desc: jnp.ndarray     # (W, K, D)
    kp_mask: jnp.ndarray  # (W, K)
    R_cw: jnp.ndarray     # (W, 3, 3) world->camera of each keyframe estimate
    t_cw: jnp.ndarray     # (W, 3)
    valid: jnp.ndarray    # (W,) bool
    count: jnp.ndarray    # () int32 number of valid keyframes
    # Visual-inertial window extension: per-keyframe velocity estimate and
    # the IMU preintegration from the PREVIOUS window keyframe to this one
    # (slot w holds the factor (w-1) -> w; slot 0 / post-roll slot 0 carry
    # imu_valid=False). Feeds the preintegrated-IMU factors of the
    # visual-inertial BA (backend/vi_ba.py).
    v_w: jnp.ndarray       # (W, 3) world-frame velocity at each keyframe
    imu_dR: jnp.ndarray    # (W, 3, 3) preintegrated rotation (body i -> j)
    imu_dv: jnp.ndarray    # (W, 3) preintegrated velocity (frame-i body)
    imu_dp: jnp.ndarray    # (W, 3) preintegrated position (frame-i body)
    imu_dt: jnp.ndarray    # (W,) integration time
    imu_valid: jnp.ndarray  # (W,) bool factor validity
    # First-order bias Jacobians of each stored factor (Forster eq. 69-71,
    # chained across frames by the engine) and the bias linearization point
    # the factor was integrated at. These are what make ONLINE bias
    # estimation possible: the VI-BA corrects each factor to a candidate
    # bias b via dR·Exp(J_R_bg δbg), dv + J_v_bg δbg + J_v_ba δba, ...
    # without re-integrating raw IMU (which is not retained). Capability
    # upgrade over the reference's in-run gyro recalibration
    # (/root/reference/src/Imu.cpp:423-428).
    imu_J_R_bg: jnp.ndarray  # (W, 3, 3)
    imu_J_v_bg: jnp.ndarray  # (W, 3, 3)
    imu_J_v_ba: jnp.ndarray  # (W, 3, 3)
    imu_J_p_bg: jnp.ndarray  # (W, 3, 3)
    imu_J_p_ba: jnp.ndarray  # (W, 3, 3)
    imu_bg_ref: jnp.ndarray  # (W, 3) gyro bias used when integrating slot w
    imu_ba_ref: jnp.ndarray  # (W, 3) accel bias used when integrating slot w


class EngineState(NamedTuple):
    # Inertial state (body frame b, world frame w).
    q_wb: jnp.ndarray        # (4,) body orientation
    v_w: jnp.ndarray         # (3,) velocity (world)
    bias_g: jnp.ndarray      # (3,)
    bias_a: jnp.ndarray      # (3,)
    # Camera pose estimate, camera-to-world: X_w = R_wc X_c + p_wc.
    R_wc: jnp.ndarray        # (3, 3)
    p_wc: jnp.ndarray        # (3,)
    # Last-keyframe anchor (pose + features) the frontend tracks against.
    kf_R_wc: jnp.ndarray     # (3, 3)
    kf_p_wc: jnp.ndarray     # (3,)
    kf_feat: Features
    kf_image: jnp.ndarray    # (H, W) f32 keyframe image (photometric refine)
    # Rolling keyframe window for windowed BA.
    window: KeyframeWindow
    frame_idx: jnp.ndarray   # () int32
    kf_count: jnp.ndarray    # () int32
    kf_time: jnp.ndarray     # () f32 seconds since the last keyframe
    kf_dp_imu: jnp.ndarray   # (3,) IMU-predicted world displacement since kf
    # Body-frame preintegration accumulated since the last keyframe (frame-i
    # body coords, i = last keyframe); becomes the window IMU factor on
    # keyframe promotion.
    kf_pre_dR: jnp.ndarray   # (3, 3)
    kf_pre_dv: jnp.ndarray   # (3,)
    kf_pre_dp: jnp.ndarray   # (3,)
    # Bias Jacobians of the accumulated keyframe->current factor, chained
    # alongside it (linearization point == the CURRENT bias state; whenever
    # bias_g/bias_a change mid-interval the accumulators are first-order
    # re-corrected so this invariant holds).
    kf_pre_J_R_bg: jnp.ndarray  # (3, 3)
    kf_pre_J_v_bg: jnp.ndarray  # (3, 3)
    kf_pre_J_v_ba: jnp.ndarray  # (3, 3)
    kf_pre_J_p_bg: jnp.ndarray  # (3, 3)
    kf_pre_J_p_ba: jnp.ndarray  # (3, 3)
    # Sliding-window marginalization prior on window slot 0 (pose twist +
    # velocity, 9 dims): information matrix + linearization point. 'active'
    # is what the VI-BA consumes; 'pend' targets the CURRENT slot 1 (the
    # next slot 0) and is computed by the VI-BA each refinement; the engine
    # swaps pend -> active when the window rolls (keyframe eviction).
    # Replaces hard gauge pinning in online_gauge="marg" mode — evicted
    # keyframes keep constraining the window instead of vanishing (the
    # upgrade of /root/reference/src/VISystem.cpp:1113-1448's frame-pair GN
    # to a proper marginalized sliding window).
    marg_H: jnp.ndarray         # (9, 9)
    marg_R_cw: jnp.ndarray      # (3, 3)
    marg_t_cw: jnp.ndarray      # (3,)
    marg_v: jnp.ndarray         # (3,)
    marg_pend_H: jnp.ndarray    # (9, 9)
    marg_pend_R_cw: jnp.ndarray  # (3, 3)
    marg_pend_t_cw: jnp.ndarray  # (3,)
    marg_pend_v: jnp.ndarray     # (3,)
    # GT-free bootstrap: set once the linear visual-inertial alignment
    # (engine/bootstrap.py) has re-anchored scale/gravity/velocities.
    vi_aligned: jnp.ndarray      # () bool
    # Vision-chained monocular scale (round 4, bootstrap phase): depths of
    # the keyframe's keypoints (KF-camera frame, current world scale),
    # triangulated at the previous promotion. Chaining the per-step
    # translation magnitude through these depths keeps the PRE-alignment
    # trajectory consistently scaled (one global free factor) — the
    # property the linear VI alignment requires; with the raw per-step IMU
    # scale, a cold start (v0 wrong) scales every step differently and no
    # global-scale fit exists (measured: fitted scale NEGATIVE until frame
    # ~21; BENCH_NOTES round-4 gate trace).
    kf_depths: jnp.ndarray       # (K,) f32 (SHADOW scale)
    kf_depth_valid: jnp.ndarray  # (K,) bool
    # The SHADOW trajectory the chain maintains: same rotations as the real
    # state, translations scaled by the depth chain — consistently scaled
    # up to one global factor even under a cold start. The alignment FITS
    # against these positions; the real trajectory is only touched when an
    # apply fires (warm runs stay bit-exact). Trailing fields: legacy
    # positional checkpoints still pad cleanly.
    shadow_win_p: jnp.ndarray    # (W, 3) shadow position per window slot
    shadow_p_wc: jnp.ndarray     # (3,) current shadow position
    shadow_kf_p_wc: jnp.ndarray  # (3,) shadow position of the last keyframe
    shadow_scale: jnp.ndarray    # () last chained step length (fallback +
                                 # chain seed). 0 = unseeded: the engine
                                 # seeds the GLOBAL shadow scale once from
                                 # the first IMU-predicted step length
                                 # (advisor round 4: a fixed seed pins the
                                 # fit's s to true_step/seed, so platforms
                                 # with unusual step lengths tripped the
                                 # scale sanity bound). Only the global
                                 # factor comes from the (possibly corrupt)
                                 # IMU prediction — per-step consistency
                                 # always comes from the depth chain.
    # Trajectory ORIGIN anchors (round 5, VERDICT #8): the initial real and
    # shadow positions (equal at init). The shadow track is continuous from
    # the origin, so a bootstrap apply re-bases the trajectory as
    # origin + s * (shadow - shadow_origin) — removing the PERMANENT
    # position offset the corrupt pre-alignment segment otherwise bakes
    # into unaligned ATE (round-4 tail analysis: the alignment fixed
    # scale/velocity but had "no position reference to re-anchor against";
    # the shadow origin IS that reference).
    origin_p_wc: jnp.ndarray     # (3,)
    shadow_origin_p: jnp.ndarray  # (3,)
    # Count of full bootstrap re-anchors applied (positions rewritten).
    # Consumed by the host-side retroactive bootstrap smoothing
    # (eval/smooth.py, CLI): a run that never applied must not be smoothed.
    bootstrap_applies: jnp.ndarray  # () int32
    # Two-phase ENGAGEMENT latch (round 5, distinct from vi_aligned): the
    # state is kinematically CONSISTENT with the window's IMU factors
    # (r_cur <= floor), with NO excitation requirement. Excitation gates
    # trusting the alignment FIT's scale (degenerate under near-constant
    # velocity) — but engaging the VI-BA only requires that the factors
    # not fight the state, which r_cur measures directly. On warm gentle
    # runs this latches ~4 promotions before vi_aligned (excitation builds
    # slowly), recovering the always-on VI-BA's early-window refinement
    # (measured: gentle0 'ends' 0.418 with the excitation-gated latch —
    # worse than its own phase-1 open loop at 0.382). vi_aligned keeps its
    # strict semantics ("scale is trusted/metric") for the open-loop
    # supervision's post-latch downgrade to velocity-only.
    vi_engaged: jnp.ndarray      # () bool


def init_window(W: int, K: int, D: int,
                desc_dtype=jnp.float32) -> KeyframeWindow:
    return KeyframeWindow(
        uv=jnp.zeros((W, K, 2), jnp.float32),
        desc=jnp.zeros((W, K, D), desc_dtype),
        kp_mask=jnp.zeros((W, K), bool),
        R_cw=jnp.tile(jnp.eye(3, dtype=jnp.float32), (W, 1, 1)),
        t_cw=jnp.zeros((W, 3), jnp.float32),
        valid=jnp.zeros((W,), bool),
        count=jnp.zeros((), jnp.int32),
        v_w=jnp.zeros((W, 3), jnp.float32),
        imu_dR=jnp.tile(jnp.eye(3, dtype=jnp.float32), (W, 1, 1)),
        imu_dv=jnp.zeros((W, 3), jnp.float32),
        imu_dp=jnp.zeros((W, 3), jnp.float32),
        imu_dt=jnp.zeros((W,), jnp.float32),
        imu_valid=jnp.zeros((W,), bool),
        imu_J_R_bg=jnp.zeros((W, 3, 3), jnp.float32),
        imu_J_v_bg=jnp.zeros((W, 3, 3), jnp.float32),
        imu_J_v_ba=jnp.zeros((W, 3, 3), jnp.float32),
        imu_J_p_bg=jnp.zeros((W, 3, 3), jnp.float32),
        imu_J_p_ba=jnp.zeros((W, 3, 3), jnp.float32),
        imu_bg_ref=jnp.zeros((W, 3), jnp.float32),
        imu_ba_ref=jnp.zeros((W, 3), jnp.float32),
    )


def init_state(
    feat0: Features,
    image0,
    q_wb0,
    v_w0,
    p_wc0,
    R_wc0,
    bias_g=None,
    bias_a=None,
    window_size: int = 10,
    desc_dtype=jnp.float32,
) -> EngineState:
    """State at frame 0; feat0 becomes the first keyframe.

    Mirrors the reference's init-from-GT (InitializeSystem,
    /root/reference/src/VISystem.cpp:111-141): the initial pose/velocity come
    from the caller (GT row or origin).
    """
    K, D = feat0.desc.shape
    win = init_window(window_size, K, D, desc_dtype=desc_dtype)
    R_cw0 = R_wc0.T
    t_cw0 = -R_wc0.T @ p_wc0
    win = win._replace(
        uv=win.uv.at[0].set(feat0.uv),
        desc=win.desc.at[0].set(feat0.desc.astype(win.desc.dtype)),
        kp_mask=win.kp_mask.at[0].set(feat0.mask),
        R_cw=win.R_cw.at[0].set(R_cw0),
        t_cw=win.t_cw.at[0].set(t_cw0),
        valid=win.valid.at[0].set(True),
        count=jnp.asarray(1, jnp.int32),
        v_w=win.v_w.at[0].set(jnp.asarray(v_w0, jnp.float32)),
    )
    z3 = jnp.zeros(3, jnp.float32)
    return EngineState(
        q_wb=jnp.asarray(q_wb0, jnp.float32),
        v_w=jnp.asarray(v_w0, jnp.float32),
        bias_g=z3 if bias_g is None else jnp.asarray(bias_g, jnp.float32),
        bias_a=z3 if bias_a is None else jnp.asarray(bias_a, jnp.float32),
        R_wc=jnp.asarray(R_wc0, jnp.float32),
        p_wc=jnp.asarray(p_wc0, jnp.float32),
        kf_R_wc=jnp.asarray(R_wc0, jnp.float32),
        kf_p_wc=jnp.asarray(p_wc0, jnp.float32),
        kf_feat=feat0,
        kf_image=jnp.asarray(image0, jnp.float32),
        window=win,
        frame_idx=jnp.zeros((), jnp.int32),
        kf_count=jnp.asarray(1, jnp.int32),
        kf_time=jnp.zeros((), jnp.float32),
        kf_dp_imu=jnp.zeros(3, jnp.float32),
        kf_pre_dR=jnp.eye(3, dtype=jnp.float32),
        kf_pre_dv=jnp.zeros(3, jnp.float32),
        kf_pre_dp=jnp.zeros(3, jnp.float32),
        kf_pre_J_R_bg=jnp.zeros((3, 3), jnp.float32),
        kf_pre_J_v_bg=jnp.zeros((3, 3), jnp.float32),
        kf_pre_J_v_ba=jnp.zeros((3, 3), jnp.float32),
        kf_pre_J_p_bg=jnp.zeros((3, 3), jnp.float32),
        kf_pre_J_p_ba=jnp.zeros((3, 3), jnp.float32),
        marg_H=jnp.zeros((9, 9), jnp.float32),
        marg_R_cw=jnp.eye(3, dtype=jnp.float32),
        marg_t_cw=jnp.zeros(3, jnp.float32),
        marg_v=jnp.zeros(3, jnp.float32),
        marg_pend_H=jnp.zeros((9, 9), jnp.float32),
        marg_pend_R_cw=jnp.eye(3, dtype=jnp.float32),
        marg_pend_t_cw=jnp.zeros(3, jnp.float32),
        marg_pend_v=jnp.zeros(3, jnp.float32),
        vi_aligned=jnp.zeros((), bool),
        kf_depths=jnp.zeros((K,), jnp.float32),
        kf_depth_valid=jnp.zeros((K,), bool),
        shadow_win_p=jnp.zeros((window_size, 3), jnp.float32)
        .at[0].set(jnp.asarray(p_wc0, jnp.float32)),
        shadow_p_wc=jnp.asarray(p_wc0, jnp.float32),
        shadow_kf_p_wc=jnp.asarray(p_wc0, jnp.float32),
        shadow_scale=jnp.zeros((), jnp.float32),
        origin_p_wc=jnp.asarray(p_wc0, jnp.float32),
        shadow_origin_p=jnp.asarray(p_wc0, jnp.float32),
        bootstrap_applies=jnp.zeros((), jnp.int32),
        vi_engaged=jnp.zeros((), bool),
    )
