"""Attribute the step's 'state/window machinery + rest' budget slice
(scripts/profile_step_budget.py found it at ~1.0 ms = 54% of the pinned
step) by measuring scan marginals of CONFIG VARIANTS that statically remove
one feature each. Fetch-forced 24- vs 96-frame run_sequence_scan
differential, like the budget script.

Run on the real TPU:  python scripts/profile_step_variants.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def scan_marginal(cfg, reps=3):
    from vislam_tpu.data.synthetic import (
        SyntheticConfig,
        make_synthetic_sequence,
    )
    from vislam_tpu.engine import (
        VIOEngine,
        make_sequence_inputs,
        run_sequence_scan,
    )
    ts = {}
    for n in (24, 96):
        seq = make_synthetic_sequence(
            SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
        eng = VIOEngine(seq["calib"], cfg)
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
    import dataclasses

    from vislam_tpu.utils.config import SystemConfig

    print("backend:", jax.default_backend(), flush=True)

    base = SystemConfig()
    base = dataclasses.replace(
        base, frontend=dataclasses.replace(base.frontend, levels_used=1))

    variants = {
        "pinned (full)": base,
        "- vi_align_bootstrap (chain+shadow+align)": dataclasses.replace(
            base, engine=dataclasses.replace(
                base.engine, vi_align_bootstrap=False)),
        "- guided fallback branch": dataclasses.replace(
            base, frontend=dataclasses.replace(
                base.frontend, guided_fallback_px=0.0)),
        "- bias recalib (gyro+accel EMA)": dataclasses.replace(
            base, engine=dataclasses.replace(
                base.engine, gyro_recalib=False, accel_recalib=False)),
    }
    res = {}
    for name, cfg in variants.items():
        try:
            ms = scan_marginal(cfg)
        except Exception as e:  # keep going; variant flags may not all exist
            print(f"{name:46s} FAILED: {e}", flush=True)
            continue
        res[name] = ms
        print(f"{name:46s} {ms:8.3f} ms/frame", flush=True)

    if "pinned (full)" in res:
        full = res["pinned (full)"]
        print("\nattribution (full - variant):")
        for name, ms in res.items():
            if name != "pinned (full)":
                print(f"{name:46s} {full - ms:8.3f} ms")


if __name__ == "__main__":
    main()
