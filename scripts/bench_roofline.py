"""Utilization sweep on the real chip: batch size x keypoint budget.

VERDICT round-2 weak #2 asked what utilization is achievable. Round-3
finding (BENCH_NOTES): the old MFU numbers divided the ONCE-counted scan-
body cost by the trip count, under-reporting per-frame FLOPs (and MFU) by
~95x; and single-dispatch timings are inflated by the tunnel's early-return
mode. With both corrected (single-step cost analysis, block-amortized
timing) the step is MATMUL-DOMINATED (descriptor distance products), not
bandwidth-bound, and batch mode runs at a large fraction of the MXU peak —
the honest utilization statement this script measures across
B in {32, 64} and K in {768 default, 2048}.

Run on the real TPU (no --cpu).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import json
import time

import numpy as np


def build_batch(cfg, seq_len=24, B=32, n_land=250):
    import jax
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_batch_scan

    seqs = [make_synthetic_sequence(
        SyntheticConfig(n_frames=seq_len, n_landmarks=n_land, seed=s))
        for s in range(B)]
    eng = VIOEngine(seqs[0]["calib"], cfg)
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[eng.initialize(s["images"][0], q_wb0=s["gt_quat"][0],
                         v_w0=s["gt_vel"][0], p_w0=s["gt_pos"][0])
          for s in seqs])
    inps = [make_sequence_inputs(s) for s in seqs]
    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps)
    kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])

    def run():
        f, r = run_batch_scan(eng, states, inputs, kf0)
        jax.block_until_ready(r.p_wc)

    return run, B * (seq_len - 1), (eng, seqs[0])


def step_cost(eng, seq):
    """Single-frame (flops, bytes-upper-bound) from the compiled step."""
    import jax
    import jax.numpy as jnp

    s0 = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0],
                        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    imu = jnp.zeros((16, 6), jnp.float32)
    dt = jnp.zeros(16, jnp.float32)
    comp = eng._step.lower(
        s0, jnp.asarray(seq["images"][1], jnp.float32), imu, dt,
        jnp.asarray(0.05, jnp.float32), jax.random.PRNGKey(0)).compile()
    ca = comp.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    return (float(d.get("flops", 0.0)), float(d.get("bytes accessed", 0.0)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vislam_tpu.utils.config import SystemConfig

    PEAK = 197e12   # v5e bf16 matmul peak

    cfg_768 = SystemConfig()  # levels_used=2 default: K = 512 + 256
    c = SystemConfig()
    cfg_2048 = dataclasses.replace(c, frontend=dataclasses.replace(
        c.frontend, kp_per_cell=28, kp_per_cell_coarse=4))  # 64*(28+4)=2048

    variants = {}
    for name, cfg, B in [("K768_B32", cfg_768, 32),
                         ("K768_B64", cfg_768, 64),
                         ("K2048_B32", cfg_2048, 32)]:
        run, n, (eng, seq0) = build_batch(cfg, B=B)
        variants[name] = (run, n, eng, seq0, cfg.frontend.max_keypoints)

    # Warm (compile) every variant, then interleave BLOCK reps (the
    # tunnel's early-return mode inflates single-dispatch times).
    for name, (run, *_rest) in variants.items():
        t0 = time.perf_counter()
        run()
        print(f"# compiled+ran {name} in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        run()
    INNER = 8
    times = {k: [] for k in variants}
    for _ in range(5):
        for name, (run, *_r) in variants.items():
            t0 = time.perf_counter()
            for _ in range(INNER):
                run()
            times[name].append((time.perf_counter() - t0) / INNER)

    out = {}
    for name, (run, n, eng, seq0, K) in variants.items():
        fl, by = step_cost(eng, seq0)
        t = np.asarray(times[name])
        fps = n / float(t.min())
        out[name] = {
            "K": K, "fps_block_best": round(fps, 0),
            "fps_block_median": round(n / float(np.median(t)), 0),
            "flops_per_frame": round(fl, 0),
            "bytes_per_frame_upperbound": round(by, 0),
            "achieved_tflops": round(fl * fps / 1e12, 2),
            "mfu_vs_bf16_peak": round(fl * fps / PEAK, 4),
        }
        print(name, json.dumps(out[name]))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
