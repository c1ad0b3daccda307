"""GT-free visual-inertial bootstrap: apply the linear VI alignment
(inertial/vi_align.py) to the engine's keyframe window.

The reference bootstraps monocular scale from ground truth (setGtRes,
/root/reference/src/VISystem.cpp:523-527) and its plot tool rescales by hand
(tools/plot/plot.py:200-202). In IMU-scale (GT-free) mode this module is the
principled replacement: once the window holds enough preintegrated IMU
factors, one linear least-squares solve recovers the monocular scale
correction and all keyframe velocities, and the engine state is re-anchored
to the metric solution.

Three measured failure modes shape the gating (see BENCH_NOTES round 3):

1. DEGENERACY: for near-constant-velocity windows, scale and the
   along-track velocity offset are almost unobservable (the fit residual is
   tiny while scale is 25% off). Gate: velocity EXCITATION — the spread of
   the IMU-integrated velocity deltas across the window (state-independent)
   must exceed a floor before the fit is trusted at all.
2. FREE GRAVITY destabilizes short windows: the engine's filter attitude is
   already gravity-anchored, so the applied solve FIXES gravity; the
   free-gravity solve runs only as a data-consistency check.
3. A healthy state must not be "corrected": the alignment is applied only
   when the CURRENT state's kinematic residual is decisively worse than the
   fit's (model comparison), i.e. the velocity/scale state is actually
   inconsistent with the window's IMU factors (cold start, wrong v0).
   Measured separation: healthy runs r_cur <= 0.006, corrupted >= 0.009.

Runs INSIDE the jitted engine step behind a lax.cond on keyframe promotion
(fixed shapes, masked invalid slots), so both the host-loop CLI and the
offline scan runner get it for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vislam_tpu.engine.state import EngineState
from vislam_tpu.inertial.vi_align import vi_align, vi_align_fixed_gravity


def _current_state_residual(R_wb, p, v_win, dv, dp, dt, g_w, mask):
    """RMS kinematic residual of the CURRENT window state (s=1, stored
    velocities) against the IMU factors — the model-comparison baseline."""
    m = mask.astype(jnp.float32)[:, None]
    dtk = dt[:, None]
    Rdp = jnp.einsum("kij,kj->ki", R_wb[:-1], dp)
    Rdv = jnp.einsum("kij,kj->ki", R_wb[:-1], dv)
    e_p = (p[1:] - p[:-1] - v_win[:-1] * dtk
           - 0.5 * g_w[None] * dtk * dtk - Rdp) * m
    e_v = (v_win[1:] - v_win[:-1] - g_w[None] * dtk - Rdv) * m
    n = jnp.maximum(jnp.sum(m) * 6.0, 1.0)
    return jnp.sqrt((jnp.sum(e_p * e_p) + jnp.sum(e_v * e_v)) / n)


def vi_align_window(state: EngineState, R_bc, gravity: float,
                    min_factors: int = 4,
                    scale_bounds=(0.02, 50.0),
                    max_gravity_err: float = 1.5,
                    min_gravity_cos: float = 0.94,
                    min_excitation: float = 0.5,
                    resid_floor: float = 0.007,
                    resid_ratio: float = 1.6,
                    engage_min_excitation: float = 1.5) -> EngineState:
    """Attempt the linear alignment on the current window.

    Outcomes (all decided by where-gating, fixed shapes):
      - fit untrustworthy (too few factors / no excitation / sanity fail):
        state unchanged, vi_aligned stays False -> retried next promotion.
      - fit trustworthy AND current state consistent with the IMU factors:
        state unchanged, vi_aligned set (healthy warm start — done).
      - fit trustworthy AND current state inconsistent: re-anchor scale +
        velocities (+ reset any marginalization prior, whose linearization
        the re-anchoring invalidates), vi_aligned set.

    R_bc: camera->body extrinsic rotation (HLO literal / numpy).

    scale_bounds (round 5, advisor): the fit's s maps the SHADOW track to
    metric, and the shadow's global scale is set by an arbitrary seed (the
    depth chain preserves only relative scale) — so a tight s-window carries
    no sanity signal and silently disables the bootstrap on platforms whose
    true step length is far from the seed. The bound now only rejects
    degenerate fits (s ~ 0 or exploded); gravity consistency, excitation and
    the model-comparison ratio carry the sanity load.

    Composition with the default VI-BA mode (round 5, VERDICT #1) is
    TWO-PHASE, decided in the engine/refine, not here: until the healthy
    latch (state.vi_aligned), the window BA runs VISION-ONLY (IMU factors
    masked out in engine/refine.py) and this module supervises exactly as
    in open loop — the kinematic triggers stay valid because no optimizer
    is re-balancing velocities against the IMU. After the latch, the full
    VI-BA engages and this module stops firing. Two rejected alternatives,
    both measured: (a) the kinematic trigger under a live VI-BA misreads
    the BA's intentional vision/IMU balance as inconsistency (round 3:
    gentle warm 0.35 -> 0.90; r_cur does not separate warm from cold —
    round-4 medians 0.0101 vs 0.0076); (b) a scale-disagreement trigger
    (fit scale vs the least-squares real-window/shadow scale) drowns in
    the shadow chain's within-window scale noise (round 5: warm-run ratio
    band 0.70-2.0 overlaps the 1.5-1.65x cold signature; spurious applies
    took a warm 40-frame VI-BA run from ~0.37 to 0.71 ATE).
    """
    win = state.window
    W = win.valid.shape[0]
    R_bc = jnp.asarray(R_bc, jnp.float32)

    # Body->world rotations and camera(=body, lever arm neglected) positions
    # per window slot: R_wb = R_cw^T R_bc^T (vi_ba.py convention).
    R_wb = jnp.einsum("wji,kj->wik", win.R_cw, R_bc)
    p = -jnp.einsum("wji,wj->wi", win.R_cw, win.t_cw)          # (W, 3)
    # The FIT runs on the SHADOW positions (round 4): the depth-chain keeps
    # them consistently scaled even when the per-step IMU scale is corrupt
    # (cold start), which is the global-scale model vi_align assumes —
    # measured: fitting the REAL cold-start window yields NEGATIVE scale
    # until ~frame 21 (BENCH_NOTES gate trace). The health check (r_cur)
    # stays on the REAL state, so healthy warm runs latch untouched.
    p_sh = state.shadow_win_p                                  # (W, 3)

    # Interval k -> k+1 uses the factor stored at slot k+1.
    mask = win.imu_valid[1:] & win.valid[1:] & win.valid[:-1]  # (W-1,)
    g_w = jnp.array([0.0, 0.0, -gravity], jnp.float32)
    dv, dp, dt = win.imu_dv[1:], win.imu_dp[1:], win.imu_dt[1:]

    align = vi_align_fixed_gravity(R_wb, p_sh, dv, dp, dt, g_w, mask=mask)
    check = vi_align(R_wb, p_sh, dv, dp, dt, mask=mask)

    # --- Excitation (state-independent): spread of the IMU-integrated
    # cumulative velocity across the window. Near-constant velocity makes
    # (scale, along-track velocity offset) degenerate.
    m_f = mask.astype(jnp.float32)[:, None]
    dVk = (jnp.einsum("kij,kj->ki", R_wb[:-1], dv)
           + g_w[None] * dt[:, None]) * m_f              # true world dv_k
    V = jnp.cumsum(jnp.concatenate([jnp.zeros((1, 3)), dVk], 0), axis=0)
    w_slot = jnp.concatenate([jnp.ones((1,)), mask.astype(jnp.float32)])
    V_mean = jnp.sum(V * w_slot[:, None], 0) / jnp.maximum(
        jnp.sum(w_slot), 1.0)
    excitation = jnp.max(
        jnp.linalg.norm(V - V_mean, axis=-1) * w_slot)

    # --- Model comparison: current state vs fit.
    r_cur = _current_state_residual(R_wb, p, win.v_w, dv, dp, dt, g_w, mask)
    r_fit = align.residual

    # --- Real-vs-shadow scale (used by the VI-BA trigger): least-squares
    # scale mapping the centered shadow positions onto the centered real
    # window positions, over valid slots. Rotation-free by construction
    # (shadow and real share per-step rotations/directions).
    w_v = win.valid.astype(jnp.float32)[:, None]
    n_v = jnp.maximum(jnp.sum(w_v), 1.0)
    p_c = (p - jnp.sum(p * w_v, 0) / n_v) * w_v
    p_shc = (p_sh - jnp.sum(p_sh * w_v, 0) / n_v) * w_v
    s_real = jnp.sum(p_c * p_shc) / jnp.maximum(
        jnp.sum(p_shc * p_shc), 1e-12)

    s = align.scale
    g = check.gravity
    g_norm = jnp.linalg.norm(g)
    g_cos = -g[2] / jnp.maximum(g_norm, 1e-6)  # alignment with world -z
    n_fac = jnp.sum(mask)
    trustworthy = (
        (n_fac >= min_factors)
        & (excitation >= min_excitation)
        & jnp.isfinite(s)
        & (s > scale_bounds[0]) & (s < scale_bounds[1])
        & (jnp.abs(g_norm - gravity) < max_gravity_err)
        & (g_cos > min_gravity_cos)
        & jnp.all(jnp.isfinite(align.velocities))
        & jnp.isfinite(r_fit) & jnp.isfinite(r_cur)
    )
    # Health check on the CURRENT state. Gated on the SAME excitation floor
    # as the fit (round-4, advisor finding): under the degeneracy this
    # module documents (failure mode 1), r_cur is equally blind — a
    # scale-corrupted state in a low-excitation window passes
    # r_cur <= resid_floor while scale is 25% off. Un-excited windows
    # neither apply nor finish; the alignment retries at later promotions
    # once motion actually observes the scale.
    healthy = (n_fac >= min_factors) & jnp.isfinite(r_cur) \
        & (r_cur <= resid_floor) & (excitation >= min_excitation)
    # ENGAGEMENT criterion (round 5 late, state.vi_engaged; only consumed
    # under VI-BA): healthy AND excitation high enough that the VI-BA's
    # IMU factors can OWN global scale (engage_min_excitation, default
    # 1.5 — above the 0.5 fit floor). Mechanism, measured on the
    # 5-scenario ensemble: at low excitation the windowed BA cannot hold
    # global scale (its gauge pins two poses; IMU scale observability is
    # weak), while the shadow-chain full re-anchor can — so handing off at
    # first-healthy (exc 0.5-0.7) leaves scale drift the engaged BA never
    # corrects (gentle0 'ends' 0.418, WORSE than its own phase-1 open loop
    # 0.382; the supervision's later full applies at exc >= 1.0 are what
    # recover it: deadline-only engagement measured 0.294). At high
    # excitation the BA wins decisively (aggr3 0.198 engaged-early vs
    # 0.256 deadline-only), so engagement must not wait for the deadline
    # either. Two FALSIFIED alternatives, both measured: (a) engagement on
    # kinematic consistency alone (r_cur <= floor, no excitation) latches
    # before a DRIFTING gyro bias shows up in r_cur (drift-bias 'ends'
    # 0.352 -> 0.733); (b) a rotation self-consistency residual (factor
    # dR, bias-corrected at the current estimate, vs the vision rotation
    # chain) does not separate the regimes — it is dominated by vision
    # rotation noise, and the online gyro EMA tracks the drift (gentle0
    # r_rot 0.0033-0.0044 vs drift-bias 0.0019-0.0045).
    # BOOTSTRAPPED runs (>= 1 full apply — cold starts) engage at first
    # healthy regardless of excitation: the supervision has already
    # rewritten the trajectory and the iterated re-alignment only
    # declares healthy once the state STAYS consistent, so first-healthy
    # is the measured-best hand-off there (cold VI-BA 0.737/0.770/0.418/
    # 0.443 engaging at healthy vs 0.835/0.815/0.423/0.422 waiting for
    # excitation). Never-applied (warm) runs wait for the excitation
    # floor — their phase 1 is a bit-exact no-op, so waiting is free.
    engage = healthy & ((excitation >= engage_min_excitation)
                        | (state.bootstrap_applies > 0))
    # Unhealthy state + a fit that explains the window decisively better ->
    # apply. A corrupted window can defeat the (s, v) model entirely (both
    # residuals large, ratio ~1) — then neither apply nor finish: retry at
    # later promotions, as corrupt keyframes roll out of the window.
    inconsistent = (r_cur > resid_floor) & (r_fit < r_cur / resid_ratio)
    apply = trustworthy & inconsistent
    # Post-latch supervision applies VELOCITY ONLY (round 4): once a
    # healthy determination was made, the trajectory scale is trusted and
    # re-writing past window positions from the (approximately consistent)
    # shadow can hurt global ATE (measured: 40-frame warm run 0.125 ->
    # 0.270 with full re-anchors live post-latch, vs 0.417 -> 0.280
    # improvement at 60 frames from velocity supervision). Velocity is the
    # state whose error COMPOUNDS in open loop — correcting it stops the
    # drift without touching history.
    # Apply-strength semantics are IDENTICAL in open loop and under VI-BA
    # (round 5 late, measured): full applies until the first healthy
    # determination (vi_aligned), velocity-only after. Two VI-BA-specific
    # alternatives were built and FALSIFIED on the ensemble: (a) full
    # applies until ENGAGEMENT (gentle2 60 f warm 0.18 -> 0.36 — a full
    # apply with a drift-polluted fit scale s=0.824 fired where the
    # velocity-only downgrade was the right call); (b) decisive-only
    # post-engagement applies at 2x the floor (gentle0/gentle2 80 f
    # 0.418/0.309 -> 0.585/0.484 — the fit's scale under a live BA is
    # unreliable, independently reconfirming the round-3 failure).
    apply_full = apply & (~state.vi_aligned)
    # Post-latch corrections wait for MEANINGFUL drift (2x the floor):
    # correcting a barely-inconsistent state trades real trajectory
    # for fit noise (measured: 40-frame warm 0.125 -> 0.148 with the
    # plain floor; the 60-frame wins survive the higher trigger).
    apply_vel = apply & (
        (~state.vi_aligned) | (r_cur > 2.0 * resid_floor))
    import os as _os
    if _os.environ.get("VISLAM_DEBUG_ALIGN"):
        jax.debug.print(
            "align: nfac={n} exc={e:.3f} s={s:.3f} s_real={sr:.3f} "
            "r_fit={rf:.4f} r_cur={rc:.4f} trust={t} healthy={h} "
            "engage={g} applyF={a} applyV={av}",
            n=n_fac, e=excitation, s=s, sr=s_real, rf=r_fit, rc=r_cur,
            t=trustworthy, h=healthy, g=engage, a=apply_full,
            av=apply_vel)

    # Re-anchor: replace the window/engine positions with the SCALED SHADOW
    # geometry, and install the aligned velocities. (The shadow shape is
    # the consistently-scaled trajectory; s maps it to metric.)
    # Round 5 (VERDICT #8): EARLY applies anchor at the trajectory ORIGIN —
    # the shadow track is continuous from initialization, so
    # origin + s * (shadow - shadow_origin) reconstructs the metric
    # position of every frame including the corrupt pre-alignment segment
    # (slot-0 anchoring froze that segment's drift as a permanent offset;
    # round-4 tail analysis). Early = before the window has rolled far
    # (kf_count <= W + 2), where origin- and slot-0-anchoring were
    # measured bit-identical on cold starts. LATE applies (a run whose
    # latch never fires, e.g. drifting IMU bias keeps the health residual
    # above the floor while fits thrash) anchor at the real window slot 0:
    # a global origin-rebase with a locally-fitted scale imports the whole
    # accumulated chain drift (measured: drift-bias supervised open loop
    # 0.77 -> 1.11 with unconditional origin anchoring).
    W_sl = win.valid.shape[0]
    early = state.kf_count <= (W_sl + 2)
    p0 = jnp.where(early, state.origin_p_wc, p[0])
    p_sh0 = jnp.where(early, state.shadow_origin_p, p_sh[0])
    p_new = p0 + s * (p_sh - p_sh0)
    t_cw_new = -jnp.einsum("wij,wj->wi", win.R_cw, p_new)
    # Velocities: write back only where at least one adjacent interval
    # constrained them (others are regularization artifacts).
    adj = jnp.zeros((W,), bool)
    adj = adj.at[1:].set(mask)
    adj = adj.at[:-1].set(adj[:-1] | mask)
    v_new = jnp.where(adj[:, None], align.velocities, win.v_w)

    anchor = jnp.clip(win.count - 1, 0, W - 1)
    kf_p_new = p0 + s * (state.shadow_kf_p_wc - p_sh0)
    p_wc_new = p0 + s * (state.shadow_p_wc - p_sh0)
    v_anchor = jnp.take(v_new, anchor, axis=0)

    sel = lambda a, b: jnp.where(apply_full, a, b)
    selv = lambda a, b: jnp.where(apply_vel, a, b)
    new_win = win._replace(
        t_cw=sel(t_cw_new, win.t_cw),
        v_w=selv(v_new, win.v_w),
    )
    # An applied re-anchor invalidates any marginalization prior's
    # linearization point — reset it (the next BA rebuilds it fresh).
    z99 = jnp.zeros((9, 9), jnp.float32)
    return state._replace(
        window=new_win,
        kf_p_wc=sel(kf_p_new, state.kf_p_wc),
        p_wc=sel(p_wc_new, state.p_wc),
        v_w=selv(v_anchor, state.v_w),
        marg_H=sel(z99, state.marg_H),
        marg_pend_H=sel(z99, state.marg_pend_H),
        # Displacement-since-keyframe accumulators are zero at promotion
        # (the only time this runs), so no rescale is needed there.
        # ITERATED re-alignment (round 4): an APPLY never latches — only a
        # HEALTHY check at a (possibly later) promotion does. A first
        # re-anchor from a window still holding corrupt keyframes is
        # coarse, and the residual velocity error re-grows inconsistency
        # (measured: post-apply r_cur 0.003 -> 0.023 over 10 frames);
        # leaving vi_aligned False lets the alignment re-fire and
        # re-anchor until the state STAYS consistent. Oscillation on a
        # healthy state is impossible: apply requires r_cur above the
        # floor AND a decisive model-comparison win every time.
        vi_aligned=state.vi_aligned | healthy,
        vi_engaged=state.vi_engaged | engage,
        bootstrap_applies=state.bootstrap_applies
        + jnp.where(apply_full, 1, 0).astype(jnp.int32),
    )
