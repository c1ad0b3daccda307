"""Stage decomposition of the in-step windowed VI-BA (VERDICT r04 #4/#6):
slam_scan pays ~1.3-2.9 ms/frame for the fused window refine and nobody
knew where inside it the time went. Fetch-forced trip-differential rows:

  - build_window_problem (track association + triangulation + gates)
  - one LM iteration's pieces: build_normal_equations (residual/Jacobian
    over W x K obs), reduce_landmarks (Schur), IMU normal eqs + the
    (9W+6) solve, back-substitution
  - vi_bundle_adjust at iters 2 vs 10 on a perturbed (non-converged)
    problem -> per-LM-iteration marginal
  - full refine_window

Run on the real TPU:  python scripts/profile_refine.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timeit_diff(name, make_body, carry0, *args, n_lo=4, n_hi=68, reps=4):
    @partial(jax.jit, static_argnames=("n",))
    def run(c0, n, *a):
        def body(c, _):
            return make_body(c, *a), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jax.tree.leaves(c)[0].ravel()[:2]

    ts = {}
    for n in (n_lo, n_hi):
        np.asarray(run(carry0, n, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(carry0, n, *args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    us = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e6
    print(f"{name:52s} {us:10.1f} us/iter", flush=True)
    return us


def main():
    import dataclasses

    from vislam_tpu.backend.ba import (
        BAProblem,
        BAState,
        build_normal_equations,
        back_substitute_landmarks,
        reduce_landmarks,
    )
    from vislam_tpu.backend.vi_ba import (
        ImuFactors,
        _imu_normal_equations,
        solve_vi_system,
        vi_bundle_adjust,
    )
    from vislam_tpu.data.synthetic import (
        SyntheticConfig,
        make_synthetic_sequence,
    )
    from vislam_tpu.engine import (
        VIOEngine,
        make_sequence_inputs,
        run_sequence_scan,
    )
    from vislam_tpu.engine.refine import build_window_problem, refine_window
    from vislam_tpu.utils.config import SystemConfig

    print("backend:", jax.default_backend(), flush=True)

    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg,
        frontend=dataclasses.replace(cfg.frontend, levels_used=1),
        backend=dataclasses.replace(cfg.backend, vi_factors=True))
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=40, n_landmarks=300, seed=0))
    calib = seq["calib"]
    eng = VIOEngine(calib, cfg)
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    inputs = make_sequence_inputs(seq)
    final, _res = run_sequence_scan(eng, state0, inputs,
                                    kf_gt_pos0=seq["gt_pos"][0])
    st = jax.tree.map(lambda x: np.asarray(x), final)
    st = jax.tree.map(jnp.asarray, st)  # device copies, full window

    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    be = cfg.backend
    win = st.window
    g_w = jnp.array([0.0, 0.0, -cfg.engine.gravity], jnp.float32)
    Rbc = jnp.eye(3, dtype=jnp.float32)
    W = int(win.kp_mask.shape[0])
    fixed = (jnp.arange(W) == 0) | (jnp.arange(W) == jnp.clip(
        win.count - 1, 0, W - 1))

    # carry = scalar float; perturbations derive from it so trips serialize.
    def perturbed_state(eps):
        return st._replace(window=st.window._replace(
            t_cw=st.window.t_cw + eps * 1e-4))

    def body_build(c):
        s = perturbed_state(c)
        ba_state, prob, track_ok = build_window_problem(s, cfg, fx, fy,
                                                        cx, cy)
        return c * 0.5 + (ba_state.X[0, 0] + jnp.sum(track_ok)) * 1e-12

    t_build = timeit_diff("build_window_problem", body_build,
                          jnp.float32(1.0))

    ba_state, prob, _ = build_window_problem(st, cfg, fx, fy, cx, cy)
    fac = ImuFactors(dR=win.imu_dR, dv=win.imu_dv, dp=win.imu_dp,
                     dt=win.imu_dt, valid=win.imu_valid)

    def body_normal_eqs(c):
        s2 = BAState(R=ba_state.R, t=ba_state.t + c * 1e-5, X=ba_state.X)
        Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(
            s2, prob, be.huber_delta)
        return c * 0.5 + (Hpp.ravel()[0] + bp.ravel()[0]) * 1e-12

    t_neq = timeit_diff("  LM piece: build_normal_equations", body_normal_eqs,
                        jnp.float32(1.0))

    Hpp, Hpl, Hll, bp, bl, _ = build_normal_equations(ba_state, prob,
                                                      be.huber_delta)

    def body_schur(c):
        S, rhs, Hll_inv = reduce_landmarks(Hpp + c * 1e-9, Hpl, Hll, bp, bl,
                                           1e-3)
        return c * 0.5 + S.ravel()[0] * 1e-12

    t_schur = timeit_diff("  LM piece: reduce_landmarks (Schur)", body_schur,
                          jnp.float32(1.0))

    S, rhs, Hll_inv = reduce_landmarks(Hpp, Hpl, Hll, bp, bl, 1e-3)

    def body_solve(c):
        H_imu, b_imu = _imu_normal_equations(
            win.R_cw, win.t_cw + c * 1e-6, win.v_w, fac, g_w, Rbc,
            be.vi_w_rot, be.vi_w_vel, be.vi_w_pos)
        dxi, dv = solve_vi_system(S, rhs, H_imu, b_imu, 1e-3, fixed)
        dX = back_substitute_landmarks(Hpl, Hll_inv, bl, dxi)
        return c * 0.5 + (dxi.ravel()[0] + dv.ravel()[0] + dX.ravel()[0]) * 1e-12

    t_solve = timeit_diff("  LM piece: imu-neq + solve + backsub", body_solve,
                          jnp.float32(1.0))

    def make_body_ba(iters):
        def body(c):
            s2 = BAState(R=ba_state.R, t=ba_state.t + c * 1e-3,
                         X=ba_state.X)
            (out, v2), info = vi_bundle_adjust(
                s2, prob, win.v_w, fac, g_w, Rbc, iters=iters,
                lam0=be.lm_lambda0, huber_delta=be.huber_delta,
                w_rot=be.vi_w_rot, w_vel=be.vi_w_vel, w_pos=be.vi_w_pos,
                fixed_mask=fixed)
            return c * 0.5 + (out.t.ravel()[3] + info["final_cost"]) * 1e-12
        return body

    t2 = timeit_diff("vi_bundle_adjust iters=2", make_body_ba(2),
                     jnp.float32(1.0))
    t10 = timeit_diff("vi_bundle_adjust iters=10", make_body_ba(10),
                      jnp.float32(1.0))

    def body_refine(c):
        s = perturbed_state(c)
        s2 = refine_window(s, cfg, fx, fy, cx, cy)
        return c * 0.5 + s2.p_wc[0] * 1e-12

    t_ref = timeit_diff("refine_window (full)", body_refine, jnp.float32(1.0))

    print("\n=== decomposition ===")
    per_it = (t10 - t2) / 8.0
    print(f"per-LM-iteration marginal:        {per_it:8.1f} us")
    print(f"  of which normal-eqs:            {t_neq:8.1f} us")
    print(f"  of which Schur reduce:          {t_schur:8.1f} us")
    print(f"  of which imu+solve+backsub:     {t_solve:8.1f} us")
    print(f"problem build:                    {t_build:8.1f} us")
    print(f"full refine_window:               {t_ref:8.1f} us")


if __name__ == "__main__":
    main()
