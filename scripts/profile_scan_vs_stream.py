"""Compare per-frame cost: streaming dispatch loop vs one on-device scan.

Quantifies how much of the per-step wall time is dispatch overhead (tunnel
round trips, host work) vs real device compute — and validates the scan
runner as the offline throughput mode.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_sequence_scan

    n = 32
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=n, n_landmarks=300, seed=0))
    eng = VIOEngine(seq["calib"])
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    inputs = make_sequence_inputs(seq)

    # --- scan mode (one dispatch for the whole sequence)
    t0 = time.perf_counter()
    final, results = run_sequence_scan(eng, state0, inputs, kf_gt_pos0=seq["gt_pos"][0])
    jax.block_until_ready(results.p_wc)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        final, results = run_sequence_scan(eng, state0, inputs,
                                           kf_gt_pos0=seq["gt_pos"][0])
        jax.block_until_ready(results.p_wc)
    scan_ms = (time.perf_counter() - t0) / reps / (n - 1) * 1000

    # --- streaming mode (one dispatch per frame)
    step = jax.jit(eng._build_step())
    img = jnp.asarray(seq["images"][1], jnp.float32)
    imu = jnp.zeros((16, 6))
    dt = jnp.full((16,), 0.005)
    key = jax.random.PRNGKey(0)
    gt = jnp.asarray(0.05, jnp.float32)
    s, r = step(state0, img, imu, dt, gt, key)
    jax.block_until_ready(r.p_wc)
    t0 = time.perf_counter()
    s = state0
    for _ in range(n - 1):
        s, r = step(s, img, imu, dt, gt, key)
    jax.block_until_ready(r.p_wc)
    stream_ms = (time.perf_counter() - t0) / (n - 1) * 1000

    print(f"scan compile+first run: {compile_s:.1f} s")
    print(f"scan per-frame:    {scan_ms:8.2f} ms  ({1000/scan_ms:.1f} fps)")
    print(f"stream per-frame:  {stream_ms:8.2f} ms  ({1000/stream_ms:.1f} fps)")
    print(f"dispatch overhead: {stream_ms - scan_ms:8.2f} ms/frame")


if __name__ == "__main__":
    main()
