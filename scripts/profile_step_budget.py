"""Reconciled per-stage budget of the engine step (VERDICT r04 #3).

The round-4 stage table (match 0.9, pyramid 1.3, madgwick 0.7, ... ms)
summed to ~5 ms against a measured 2.1-2.9 ms step because each row was an
ISOLATED 64-iteration program whose ~40 ms dispatch+fetch floor leaked
~0.6 ms into every row (floor/64). This script measures every row as a
TRIP-DIFFERENTIAL (two trip counts, marginal per-iteration time — the floor
cancels exactly), builds CUMULATIVE frontend prefixes so XLA cross-stage
fusion is charged where it happens, and closes the budget against the real
scanned step's marginal frame cost (24- vs 96-frame run_sequence_scan), so
rows + remainder = measured step by construction.

Run on the real TPU:  python scripts/profile_step_budget.py
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


def timeit_diff(name, make_body, carry0, *args, n_lo=8, n_hi=136, reps=5,
                quiet=False):
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
    ms = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e3
    if not quiet:
        print(f"{name:46s} {ms * 1e3:9.1f} us/iter", flush=True)
    return ms


def scan_marginal(slam: bool, reps: int = 3):
    """Marginal per-frame cost of the REAL scanned step: the difference of
    two sequence lengths through run_sequence_scan (the bench.py headline
    program), fetch-forced."""
    from vislam_tpu.data.synthetic import (
        SyntheticConfig,
        make_synthetic_sequence,
    )
    from vislam_tpu.engine import (
        VIOEngine,
        make_sequence_inputs,
        run_sequence_scan,
    )
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import importlib
    bench = importlib.import_module("bench") if False else None
    import dataclasses

    from vislam_tpu.utils.config import SystemConfig

    c = SystemConfig()
    c = dataclasses.replace(
        c, frontend=dataclasses.replace(c.frontend, levels_used=1))
    if slam:
        c = dataclasses.replace(
            c, backend=dataclasses.replace(c.backend, vi_factors=True,
                                           refine_in_step=True))
    ts = {}
    for n in (24, 96):
        seq = make_synthetic_sequence(
            SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
        eng = VIOEngine(seq["calib"], c)
        state0 = eng.initialize(
            seq["images"][0], q_wb0=seq["gt_quat"][0],
            v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
        inputs = make_sequence_inputs(seq)
        kf0 = seq["gt_pos"][0]

        def run():
            final, results = run_sequence_scan(eng, state0, inputs,
                                               kf_gt_pos0=kf0)
            np.asarray(results.p_wc[-1])

        run()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    return (ts[96] - ts[24]) / 72.0 * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    import dataclasses

    from vislam_tpu.data.synthetic import (
        SyntheticConfig,
        make_synthetic_sequence,
    )
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.calib.camera_model import unproject_pixels
    from vislam_tpu.frontend.pose import (
        ransac_translation,
        resolve_direction_sign,
    )
    from vislam_tpu.inertial import madgwick_scan, preintegrate
    from vislam_tpu.utils.config import SystemConfig

    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg, frontend=dataclasses.replace(cfg.frontend, levels_used=1))
    fe, be = cfg.frontend, cfg.backend

    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    calib = seq["calib"]
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    img = jnp.asarray(seq["images"][1], jnp.float32)
    f_kf = extract_features(jnp.asarray(seq["images"][0], jnp.float32), fe)
    key = jax.random.PRNGKey(0)

    # Cumulative frontend prefixes (fusion charged where it happens).
    def prefix_extract(c):
        f = extract_features(c, fe)
        return c + (f.desc[0, 0] + f.uv[0, 0]) * 1e-12

    def prefix_match(c):
        f = extract_features(c, fe)
        m = match_descriptors(f_kf.desc, f_kf.mask, f.desc, f.mask,
                              uv_a=f_kf.uv, ratio=fe.ratio_thresh,
                              mutual=fe.mutual_check,
                              use_pallas=fe.use_pallas_matcher)
        return c + (m.dist[0] + m.idx_b[0]) * 1e-12

    def prefix_ransac(c):
        f = extract_features(c, fe)
        m = match_descriptors(f_kf.desc, f_kf.mask, f.desc, f.mask,
                              uv_a=f_kf.uv, ratio=fe.ratio_thresh,
                              mutual=fe.mutual_check,
                              use_pallas=fe.use_pallas_matcher)
        uv_j = jnp.take(f.uv, m.idx_b, axis=0)
        ri = unproject_pixels(f_kf.uv, fx, fy, cx, cy)
        rj = unproject_pixels(uv_j, fx, fy, cx, cy)
        ri = ri / jnp.linalg.norm(ri, axis=-1, keepdims=True)
        rj = rj / jnp.linalg.norm(rj, axis=-1, keepdims=True)
        est = ransac_translation(
            ri, rj, jnp.eye(3), m.mask, key, num_hyps=be.ransac_hyps,
            thresh=be.ransac_thresh, uv_i=f_kf.uv,
            dispersion_pow=be.ransac_dispersion_pow)
        t_dir = resolve_direction_sign(ri, rj, jnp.eye(3), est.t_dir,
                                       est.inlier_mask)
        return c + (t_dir[0] + est.num_inliers) * 1e-12

    a = timeit_diff("frontend: extract (pyr+detect+describe)", prefix_extract,
                    img)
    b = timeit_diff("frontend: + match", prefix_match, img)
    c3 = timeit_diff("frontend: + ransac/sign", prefix_ransac, img)

    # Inertial block, isolated (independent of the image pipeline).
    imu = jnp.zeros((16, 6), jnp.float32)
    dt = jnp.full((16,), 0.005, jnp.float32)

    def inertial(q):
        qn, _ = madgwick_scan(q, imu[:, :3], imu[:, 3:], dt)
        pre = preintegrate(imu[:, :3], imu[:, 3:], dt, jnp.zeros(3),
                           jnp.zeros(3))
        return qn / jnp.linalg.norm(qn) + pre.dp.sum() * 1e-12

    d = timeit_diff("inertial: madgwick+preint (16)", inertial,
                    jnp.array([1.0, 0, 0, 0]))

    print("\nfull scanned step, marginal per frame:", flush=True)
    f_plain = scan_marginal(slam=False)
    print(f"{'step (scan, pinned K=512)':46s} {f_plain * 1e3:9.1f} us/frame",
          flush=True)
    f_slam = scan_marginal(slam=True)
    print(f"{'step+in-step VI-BA (slam_scan)':46s} {f_slam * 1e3:9.1f} "
          f"us/frame", flush=True)

    print("\n=== RECONCILED BUDGET (pinned config) ===")
    rows = [
        ("extract (pyramid+detect+describe)", a),
        ("match (marginal over extract)", b - a),
        ("ransac + direction sign", c3 - b),
        ("inertial (madgwick+preint)", d),
        ("state/window machinery + rest", f_plain - c3 - d),
    ]
    for name, v in rows:
        print(f"{name:46s} {v * 1e3:9.1f} us  ({v / f_plain * 100:5.1f}%)")
    print(f"{'TOTAL = measured step':46s} {f_plain * 1e3:9.1f} us")
    print(f"{'in-step VI-BA (slam_scan - scan)':46s} "
          f"{(f_slam - f_plain) * 1e3:9.1f} us")


if __name__ == "__main__":
    main()
