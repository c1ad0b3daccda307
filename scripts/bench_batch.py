"""Batched multi-sequence throughput on one chip (utilization test).

B sequences run concurrently under vmap(scan): per-frame work is small
(512-keypoint geometry), so batching multiplies MXU/VPU utilization.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_batch_scan

    n_frames = 24
    for B in (1, 2, 4, 8):
        seqs = [
            make_synthetic_sequence(SyntheticConfig(n_frames=n_frames,
                                                    n_landmarks=250, seed=s))
            for s in range(B)
        ]
        eng = VIOEngine(seqs[0]["calib"])
        states = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[eng.initialize(s["images"][0], q_wb0=s["gt_quat"][0],
                             v_w0=s["gt_vel"][0], p_w0=s["gt_pos"][0])
              for s in seqs],
        )
        inps = [make_sequence_inputs(s) for s in seqs]
        inputs = jax.tree.map(
            lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps
        )
        kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])

        # Completion barrier = HOST FETCH: block_until_ready is a no-op on
        # this backend (BENCH_NOTES "the enqueue illusion").
        f, r = run_batch_scan(eng, states, inputs, kf0)
        np.asarray(r.p_wc[..., 0, 0])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            f, r = run_batch_scan(eng, states, inputs, kf0)
            np.asarray(r.p_wc[..., 0, 0])
        wall = (time.perf_counter() - t0) / reps
        fps = B * (n_frames - 1) / wall
        print(f"B={B}:  {fps:10.1f} frames/s/chip   ({wall*1000:.1f} ms/batch)")


if __name__ == "__main__":
    main()
