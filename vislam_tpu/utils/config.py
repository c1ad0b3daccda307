"""Typed system configuration.

Replaces the reference's three config layers — CLI flags
(/root/reference/src/main_vi_slam.cpp:26-44), roslaunch files, and the
calibration XML doubling as system config
(/root/reference/calibration/calibrationEUROC.xml:43-70, parsed at
/root/reference/src/CameraModel.cpp:25-42) — with one typed dataclass tree.
All shape-determining fields are static Python ints so they can be closed
over by jit without retracing.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FrontendConfig:
    """Detection / description / matching configuration.

    The fixed capacities replace the reference's variable keypoint counts
    (grid filter num_cells=49, calibrationEUROC.xml:54) with TPU-friendly
    static shapes: top-k per grid cell, masked padding elsewhere.
    """

    # Detection — response-function family (role of the reference's detector
    # factory enum, /root/reference/src/Camera.cpp:94-138):
    #   shi_tomasi (GFTT) | harris | dog (SIFT/KAZE-like blobs) |
    #   hessian (SURF-like blobs) | fast (ORB-like segment test)
    detector: str = "shi_tomasi"
    # Dtype for the image-plane pipeline (pyramid + response convolutions) —
    # the VPU/bandwidth-bound bulk of the frame step. bfloat16 measured 2.5x
    # faster than float32 on the v5e (1.22 -> 0.48 us/frame for the
    # gradient+structure-tensor+blur chain) with ATE/matchability neutral
    # (selection, subpixel refinement, descriptors and all geometry stay
    # float32). See BENCH_NOTES round 2.
    image_dtype: str = "bfloat16"
    # Scale space the pyramid levels come from:
    #   gaussian  — 2x2-mean pyramid (SIFT/SURF/ORB-family)
    #   nonlinear — Perona-Malik FED diffusion octaves (KAZE/AKAZE-family;
    #               edge-preserving; pair with detector="hessian" for the
    #               KAZE analog, detector="fast" + descriptor="brief" for
    #               the AKAZE analog)
    scale_space: str = "gaussian"
    num_levels: int = 4            # pyramid levels (reference builds 5, uses 4)
    # Levels detection+description run on. DEFAULT 2 since round 3 —
    # matching the reference's multi-octave SURF default
    # (/root/reference/src/Camera.cpp:104-116). Level 0 keeps its FULL
    # per-cell budget and coarser levels add capacity (kp_per_cell_coarse),
    # so K = 512 + 256 = 768. Measured (BENCH_NOTES round 3): +50% matches
    # per pair at equal-or-better inlier rates on every adversarial regime,
    # aggressive-motion ATE neutral (0.108 -> 0.107 — round 2's 4.8x
    # regression was the shared-budget split, now gone), gentle ATE within
    # noise (0.183 -> 0.199).
    levels_used: int = 2
    grid_rows: int = 8
    grid_cols: int = 8
    kp_per_cell: int = 8           # level-0 budget => 8*8*8 = 512 fine kpts
    # Per-cell budget of the COARSER levels (levels_used > 1). Round-3
    # design: coarse levels are EXTRA capacity on top of the full level-0
    # budget — round 2 split one fixed K across levels (kp_per_cell 8 -> 4),
    # which halved the fine-scale budget and made aggressive motion 4.8x
    # worse (a budget artifact, not a scale-space trade-off). A coarse level
    # has 1/4 the pixels, so half the fine per-cell budget is proportionate.
    kp_per_cell_coarse: int = 4
    nms_radius: int = 2
    harris_k: float = 0.04
    min_score: float = 0.02        # relative corner-score floor (quality level)
    # Description — family (reference: float SIFT/SURF vs binary ORB/AKAZE
    # descriptors + BF vs BF-Hamming matcher, src/MatcherGPU.cpp:16-42):
    #   sift (128-D float histogram) | brief (steered BRIEF-256 binary,
    #   emitted as +-1 unit vectors so L2 == Hamming ordering on the MXU)
    descriptor: str = "sift"
    patch_size: int = 16           # descriptor support window (pixels, level-local)
    oriented: bool = False         # rotate descriptors by keypoint orientation;
                                   # upright is more stable for frame-to-frame VIO
                                   # (roll between consecutive frames is tiny)
    # Matching
    ratio_thresh: float = 0.8      # Lowe ratio (reference Matcher.cpp:158 uses 0.8)
    mutual_check: bool = True
    # Fused Pallas kernels (ops/match_kernel.py, ops/harris_kernel.py).
    # Production-wired, oracle-tested, full feature surface (incl. guided
    # gating in-kernel). ROUND-4 REVERSAL: the round-2 "XLA parity"
    # numbers were enqueue rates (struck by the round-3 forensics);
    # measured FETCH-FORCED at production shapes the fused response+NMS
    # kernel is ~1500x the XLA conv chain (4.4 us vs 6560 us/frame —
    # this runtime executes single-channel convolutions pathologically
    # slowly; scripts/bench_extract_variants.py). The detector kernel is
    # therefore ON by default; it engages only on the TPU backend
    # (detect.py falls back to the XLA path on CPU/virtual meshes).
    use_pallas_matcher: bool = False
    use_pallas_detector: bool = True
    guided_gate_px: float = 0.0    # >0: guided matching — exclude candidate
                                   # pairs farther than this from the
                                   # IMU-rotation-predicted position.
                                   # Measured both ways (round 2): on
                                   # repetitive texture it is decisive
                                   # (MATCHABILITY.md: 70.6% -> 81.8% inlier
                                   # rate at 2.2x the matches, beating
                                   # OpenCV SIFT), but as a DEFAULT it costs
                                   # accuracy on well-textured scenes by
                                   # discarding large-parallax matches (the
                                   # most translation-informative ones):
                                   # oracle cfg1 ATE 0.176 -> 0.271 at 60 px.
                                   # Per-scene opt-in, 25-60 px typical.
    # Adaptive guided-matching FALLBACK (IMU-rotation mode; engine step):
    # RESCUE-ONLY semantics. Every frame solves ungated first; only when
    # that solve is catastrophic (RANSAC inliers below the absolute floor —
    # tracking about to be lost) does a gated re-match + re-solve run
    # (lax.cond: healthy frames never pay), and it wins only on a decisive
    # inlier margin. Tuning history (measured, aggressive-VI oracle):
    # an inlier-FRACTION trigger interacts chaotically with the VI-BA
    # feedback loop — frac 0.45: oracle cfg1 0.156 -> 0.212; frac 0.30 +
    # margin 1.3: aggr-VI seed1 0.52 -> 2.02. A rescue can't hurt a
    # healthy run because it never engages there. 0 disables.
    guided_fallback_px: float = 60.0
    fallback_trigger_inliers: int = 12
    fallback_win_margin: float = 1.5
    # Aliasing failure-mode detector (round 3): also trigger the rescue when
    # the solved translation direction disagrees with the IMU-predicted one
    # (cos below this) while the IMU reports meaningful motion (norm above
    # this, meters). Period-aliased match sets pass RANSAC with healthy
    # inlier counts, so the absolute floor alone cannot detect them;
    # measured separation: healthy regimes cos >= +0.7 (p10), aliased
    # repetitive frames down to -0.2. Round 4: the trigger fires in EVERY
    # scale mode; the direction-improvement ACCEPTANCE channel stays
    # GT-scale-only (in GT-free mode the IMU direction is also the scale
    # source — accepting toward it closes a feedback loop), so GT-free
    # rescues accept only on the scale-decoupled decisive inlier win.
    fallback_dir_cos: float = 0.4
    fallback_dir_min_norm: float = 0.03
    max_matches: int = 512
    match_cell_rows: int = 7       # reference grid filter ~ sqrt(49) (Matcher.cpp:171-244)
    match_cell_cols: int = 7
    # Two-view SOLVER uses fine-level (level-0) matches only (round 4).
    # Coarse-level keypoints are EXTRA MATCHING capacity (adversarial
    # regimes: +50% matches at equal-or-better inlier rates) but their
    # 2-4 px localization quantization measurably pollutes the
    # precision-critical epipolar translation solve: EVAL config 1
    # 0.199 -> 0.183 and config 3b marg 0.867 -> 0.519 with the solver
    # restricted to fine matches (the full r02 single-scale accuracy back,
    # while matching/BA/loop keep the multi-scale capacity).
    solver_fine_only: bool = True

    @property
    def kp_per_cell_by_level(self):
        """Per-level per-cell budgets: full at level 0, coarse above."""
        return tuple(
            self.kp_per_cell if lvl == 0 else self.kp_per_cell_coarse
            for lvl in range(self.levels_used)
        )

    @property
    def max_keypoints(self) -> int:
        cells = self.grid_rows * self.grid_cols
        return cells * sum(self.kp_per_cell_by_level)

    @property
    def desc_dim(self) -> int:
        return 256 if self.descriptor == "brief" else 128


@dataclasses.dataclass(frozen=True)
class BackendConfig:
    """Two-view solver + sliding-window BA configuration."""

    # Rotation-compensated translation RANSAC (role of F2FRansac,
    # /root/reference/src/VISystem.cpp:612-769: 1000 iters, threshold 370).
    ransac_hyps: int = 512         # vectorized hypotheses per frame
    ransac_thresh: float = 0.02    # normalized-ray epipolar residual threshold
    # Dispersion-weighted hypothesis voting (round 4): score = inliers x
    # (inlier spatial std)^pow. Defends against independently-moving
    # occluders: compact occluder inlier clusters tilt count-only voting
    # ~5 deg off (measured vs a static-only oracle at 2.4 deg); dispersion
    # weighting restores the spread-out static mode. Exponent sweep
    # (end-to-end ATE, final round-4 code): occlusion 0.166/0.136/0.102/
    # 0.102/0.099 and gentle cfg1 0.189/0.202/0.200/0.206/0.206 at pow
    # 0/1/1.25/1.5/2 — 1.25 buys the full 40% occlusion gain (beating the
    # OpenCV reference's 0.127) at a ~5% gentle cost; aggressive + GT-free
    # VI configs are flat across the sweep. 0 disables (count-only votes).
    ransac_dispersion_pow: float = 1.25
    # Sliding-window BA
    window_size: int = 10          # keyframes (reference num_max_keyframes=10)
    # Storage dtype of the window DESCRIPTOR bank (W, K, D). bfloat16 since
    # round 5: the bank is the largest state tensor (2.6 MB f32) and the
    # op census showed the scan carry paying multiple full-size
    # layout-change copies of it per frame; its only consumer is the
    # window track matcher's MXU distance matmul, where bf16 inputs with
    # f32 accumulation perturb squared distances by ~0.01 on an O(1)
    # scale — far below the 0.8 ratio-test margins (EVAL configs measured
    # unchanged). float32 remains available for exact legacy behavior.
    window_desc_dtype: str = "bfloat16"
    max_landmarks: int = 512
    # LM outer iteration cap (accept/reject damped). 12 since round 5:
    # accuracy measured FLAT from 20 down to 10 on the EVAL configs
    # (round 4), the early-exit stall typically fires at ~8-9, and the cap
    # only binds on slow-tail windows whose remaining improvements are
    # ~4e-4 relative per iteration (measured trace) — the in-step refine
    # is ~124 us per iteration of pure device time (profile_refine.py).
    lm_iters: int = 12
    lm_lambda0: float = 1e-3
    # Online-refinement feedback guards: BA redistributes window-internal
    # error, so anchor corrections are capped to keep the engine<->BA loop
    # stable (uncapped corrections measured to trigger runaway divergence).
    max_anchor_trans: float = 0.10  # meters per refinement
    max_anchor_rot: float = 0.035   # radians (~2 deg) per refinement
    # Window gauge for online refinement:
    #   "oldest2" — fix the two oldest poses; the live anchor IS refined
    #               (capped). Helps when odometry is noisy (vision-only).
    #   "ends"    — fix oldest + newest; interior poses refine, the live
    #               anchor never moves (no feedback; safe default).
    #   "marg"    — sliding-window marginalization (VI mode; vision-only
    #               windows fall back to 'ends'): NO pose is hard-fixed;
    #               evicted keyframes leave a Schur-complement prior on the
    #               oldest remaining pose+velocity, so the BA can correct
    #               the live anchor (capped) instead of being pinned to
    #               drifted odometry.
    # DEFAULT 'ends' (round-3 decision; 5-scenario GT-free ensemble,
    # scripts/eval_gauge_ensemble.py): 'ends' NEVER loses to open-loop
    # (0.449/0.436/0.268/0.242/0.608 vs open-loop 0.749/0.774/0.350/0.347/
    # 0.833 on gentle0/gentle2/aggr1/aggr3/drift-bias) and has the best
    # ensemble mean (0.40 vs marg 0.57). 'marg' wins gentle motion
    # (0.343/0.400) but loses to open-loop on aggressive motion and
    # drifting bias (0.519/1.134/1.303) — a default must be safe
    # everywhere. Anchor-feedback hybrids were measured and rejected
    # (BENCH_NOTES round 3): prior position-block down-weighting destroys
    # the gentle win; prior-with-pinned-anchor loses everywhere. CLI
    # --gauge marg remains the opt-in for gentle/low-dynamic runs.
    online_gauge: str = "ends"
    marg_discount: float = 0.5     # prior down-weight per eviction (counters
                                   # re-observation double-counting)
    marg_max_trace: float = 1e6    # information cap (prevents the prior
                                   # from growing unboundedly confident)
    # Visual-inertial BA: add preintegrated-IMU factors (backend/vi_ba.py)
    # between consecutive window keyframes. Makes monocular scale,
    # roll/pitch, and per-keyframe velocities observable — the GT-free
    # upgrade over the reference's setGtRes scale injection. Gauge becomes
    # oldest-pose-only (scale needs no second fixed pose).
    vi_factors: bool = False
    # Fuse the windowed (visual-inertial) BA INTO the jitted engine step,
    # behind a lax.cond on keyframe promotion: the whole SLAM system —
    # frontend, inertial, pose solve, and window refinement — becomes ONE
    # on-device program, so the offline scan runner gets in-loop BA too
    # (the host-loop CLI instead calls engine.refine.refine_window between
    # steps, same math).
    refine_in_step: bool = False
    # Run the in-step window refine only on every refine_stride-th keyframe
    # promotion (refine_in_step scan mode). MEASURED round 5 (GT-free
    # scans): stride 2 saves ~half the refine's ~1.3 ms/frame but costs
    # gentle-warm ATE 0.242 -> 0.314 (+30%; aggressive +7%, colds +3%) —
    # the velocity feedback of EVERY promotion's solve is load-bearing on
    # low-excitation runs. Stays 1 by default; the knob is the documented
    # throughput/accuracy trade for throughput-critical deployments.
    refine_stride: int = 1
    # Two-phase GT-free initialization deadline (round 5): the windowed
    # VI-BA engages at the linear-alignment LATCH or after this many
    # keyframe promotions, whichever comes first. The latch can
    # legitimately never fire — under a DRIFTING IMU bias the kinematic
    # health residual never reaches the floor (the factors themselves are
    # biased), and without a deadline the full estimator (whose online
    # bias states are exactly the cure) never engaged: measured drift-bias
    # ensemble ATE 1.112 with ends==open_loop identically, vs 0.645 in
    # r04. Cold starts re-anchor at promotion ~6-10 (frames 11-21), so 20
    # promotions is comfortably past the window the gating protects.
    vi_two_phase_max_kfs: int = 20
    vi_w_rot: float = 1e4          # IMU factor precisions (1/dt-scaled)
    vi_w_vel: float = 1e2
    vi_w_pos: float = 1e2
    max_anchor_vel: float = 0.5    # m/s velocity-anchor correction cap
    # Online IMU-bias estimation inside the VI window BA: one shared
    # (δbg, δba) correction joins the state, each stored factor is
    # first-order corrected through its bias Jacobians, and the refined
    # bias feeds back (capped) into the engine state for all subsequent
    # preintegration. Role of the reference's in-run gyro recalibration
    # (/root/reference/src/Imu.cpp:423-428) made GT/stillness-free.
    estimate_bias: bool = True     # active only when vi_factors is on
    # Prior precisions pulling the window bias toward the engine's current
    # estimate. Scaled well BELOW the window's own bias information
    # (rotation factors carry ~(W-1)·w_rot·dt ≈ 1e4-1e5 on the gyro bias)
    # so measurements dominate; the weakly-observed accel bias converges
    # over successive windows EMA-style.
    vi_w_bg_prior: float = 1e4
    vi_w_ba_prior: float = 3e3
    max_bias_g_step: float = 0.005  # rad/s cap per refinement write-back
    max_bias_a_step: float = 0.05   # m/s^2 cap per refinement write-back
    bias_min_factors: int = 4       # valid IMU factors required before the
                                    # window bias is trusted (early short-
                                    # baseline windows estimate it wildly)
    # Write-back deadband: corrections below these norms are estimation
    # noise when the bias is already right — applying them just jitters the
    # orientation/scale paths. (Measured: with a well-calibrated bias,
    # deadband-free write-back costs ~0.1 m ATE on the 80-frame oracle.)
    bias_g_deadband: float = 0.0015  # rad/s
    bias_a_deadband: float = 0.015   # m/s^2
    huber_delta: float = 2.0       # pixels (robust loss; reference had Tukey, disabled)
    # Pre-BA outlier gates (0 disables): max reprojection residual of an
    # observation at the initial window geometry, and max triangulation
    # closest-approach gap relative to depth. Kills appearance-matching
    # outliers before they reach the (robust but not outlier-proof) LM.
    reproj_gate: float = 8.0       # pixels (floor of the adaptive gate)
    reproj_gate_mad: float = 3.0   # gate = max(floor, mad * median residual)
    tri_gap_rel: float = 0.05      # gap / depth (floor, same adaptive rule)
    min_depth: float = 0.05
    max_depth: float = 200.0


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Keyframe policy + engine behavior.

    The reference's manual-keyboard keyframe promotion
    (/root/reference/src/VISystem.cpp:364-375) becomes this automatic policy
    with its own coded thresholds (22 px disparity / 5 deg rotation,
    /root/reference/src/VISystem.cpp:313-316).
    """

    kf_disparity_px: float = 22.0
    kf_rotation_deg: float = 5.0
    min_feature_ratio: float = 0.35   # skip frame if matches < ratio * kf kpts (VISystem.cpp:297)
    use_gt_scale: bool = True         # reference parity mode (GT-scaled translation)
    vision_rotation: bool = False     # estimate R from the essential matrix
                                      # instead of the IMU (KITTI: no IMU);
                                      # static flag -> separate compiled step
    photometric_refine: bool = False  # refine the two-view pose by direct
                                      # coarse-to-fine intensity alignment
                                      # after the epipolar solve. Opt-in by
                                      # measurement: helps aggressive motion
                                      # (EVAL #3: 0.115 -> 0.101) but hurts
                                      # gentle runs (cfg1 0.179 -> 0.205,
                                      # VI 0.387 -> 0.416) where the epipolar
                                      # solve is already at the noise floor.
    imu_window: int = 16              # padded IMU samples per frame (EUROC: 16)
    gravity: float = 9.81             # reference uses 9.68 (src/Imu.cpp:337); see SURVEY §7
    max_velocity: float = 30.0        # m/s sanity clamp (divergence guard)
    # Rolling gyro-bias recalibration on quasi-static frames (role of the
    # reference's continued gyro recalibration, /root/reference/src/
    # Imu.cpp:423-428, turned into a per-frame stillness-gated EMA). The
    # detection is variance-based (bias-invariant) within the frame's IMU
    # window; the accumulated preintegration is first-order re-corrected so
    # its linearization point tracks the updated bias.
    gyro_recalib: bool = True
    recalib_gyro_std: float = 0.01    # rad/s max in-window gyro std
    recalib_accel_std: float = 0.10   # m/s^2 max in-window accel std
    recalib_accel_dev: float = 0.30   # m/s^2 max | |a| - g |
    recalib_alpha: float = 0.10       # EMA step toward the window mean
    # Gravity-anchored accel-bias EMA at stillness (round 3; in-run role of
    # the reference's gravity-removal accel calibration, Imu.cpp:125-163):
    # bias target = window accel mean - R_wb^T (0,0,+g). Smaller alpha than
    # the gyro EMA: a roll/pitch error of e rad aliases g*e into the
    # estimate, so convergence is deliberately slower.
    accel_recalib: bool = True
    recalib_accel_alpha: float = 0.05
    # GT-free bootstrap (engine/bootstrap.py): once the window holds
    # vi_align_min_factors valid preintegrated factors in IMU-scale mode,
    # the VINS-style linear alignment recovers the monocular scale
    # correction + gravity + keyframe velocities and re-anchors the engine.
    # Round 4: ITERATED — an applied alignment latches only when the fit
    # reaches the healthy floor, so later cleaner windows re-fire and
    # refine a coarse first re-anchor. Round 5: under VI-BA this is phase
    # 1 of the TWO-PHASE initialization (the window BA stays inert until
    # the latch or the vi_two_phase_max_kfs deadline; engine/refine.py),
    # early applies re-base from the trajectory origin, and the emitted
    # prefix can be retro-smoothed from the shadow track (eval/smooth.py).
    # Principled replacement for the reference's GT scale injection
    # (/root/reference/src/VISystem.cpp:523-527).
    vi_align_bootstrap: bool = True
    vi_align_min_factors: int = 4
    # Velocity-excitation floor (m/s of IMU-integrated velocity spread
    # across the window) below which the alignment fit is untrusted (the
    # (scale, along-track velocity) degeneracy; BENCH_NOTES round 3).
    vi_align_min_excitation: float = 0.5
    # VI-BA ENGAGEMENT excitation floor (round 5 late): the vi_engaged
    # latch fires at healthy + THIS excitation (above the 0.5 healthy/fit
    # floor). Between first-healthy and engagement the supervision keeps
    # running with its normal open-loop semantics (velocity-only applies
    # post-healthy) and the window BA stays inert; at engagement the full
    # estimator owns scale/velocity and supervision stops. Rationale,
    # both directions measured on the ensemble: engaging at first healthy
    # (exc ~0.5-0.7) hands scale to a BA that cannot hold it at low
    # excitation (gentle0 80 f 'ends' 0.418, worse than its own phase-1
    # open loop 0.382); never engaging early loses the BA's short-horizon
    # accuracy on dynamic runs (aggr3 0.198 engaged vs 0.256 deadline-
    # only). The deadline (vi_two_phase_max_kfs) still covers runs whose
    # healthy latch never fires (drifting IMU bias).
    vi_engage_min_excitation: float = 1.5


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    frontend: FrontendConfig = dataclasses.field(default_factory=FrontendConfig)
    backend: BackendConfig = dataclasses.field(default_factory=BackendConfig)
    engine: EngineConfig = dataclasses.field(default_factory=EngineConfig)
    # Padded image size the compute path runs at; input is padded/masked to this.
    image_height: int = 480
    image_width: int = 768            # EUROC 752 padded to 6*128 for TPU lanes
    dtype: str = "float32"

    @staticmethod
    def euroc() -> "SystemConfig":
        return SystemConfig()

    @staticmethod
    def kitti() -> "SystemConfig":
        # Single-scale: KITTI runs vision-only rotation (essential matrix),
        # which needs fine keypoint localization — coarse-level keypoints
        # measurably break the 8-point solve (see cli.py).
        return SystemConfig(
            image_height=376, image_width=1280,
            frontend=FrontendConfig(levels_used=1),
        )
