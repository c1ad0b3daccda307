"""Per-stage device timing of the VIO step's components (run on real TPU).

Identifies where the milliseconds go: detection, description, matching,
RANSAC, inertial scan. Each stage is jitted separately and timed with
block_until_ready over many reps (dispatch overhead amortized by looping
inside where possible).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.frontend.pyramid import build_pyramid
    from vislam_tpu.frontend.detect import detect_keypoints
    from vislam_tpu.frontend.descriptor import describe_keypoints
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.frontend.pose import ransac_translation
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.inertial import madgwick_scan, preintegrate
    from vislam_tpu.utils.config import FrontendConfig

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    img = jnp.asarray(seq["images"][1], jnp.float32)
    cfg = FrontendConfig()

    def timeit(name, fn, *args, reps=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:<28} {ms:8.2f} ms")
        return out

    pyr_fn = jax.jit(lambda im: build_pyramid(im, 4))
    pyr = timeit("pyramid", pyr_fn, img)

    det_fn = jax.jit(lambda p: detect_keypoints(p, min_score_rel=cfg.min_score))
    kps = timeit("detect (harris+nms+topk)", det_fn, pyr)

    desc_fn = jax.jit(lambda im, uv, a: describe_keypoints(im, uv, a * 0))
    desc = timeit("describe (gather+einsum)", desc_fn, pyr[0], kps.uv, kps.angle)

    feat_fn = jax.jit(lambda im: extract_features(im, cfg))
    fa = timeit("extract_features (fused)", feat_fn, img)
    fb = feat_fn(jnp.asarray(seq["images"][2], jnp.float32))

    match_fn = jax.jit(
        lambda da, ma, db, mb: match_descriptors(da, ma, db, mb, ratio=0.8)
    )
    m = timeit("match (MXU+top2)", match_fn, fa.desc, fa.mask, fb.desc, fb.mask)

    rays_a = jnp.concatenate([fa.uv, jnp.ones((fa.uv.shape[0], 1))], -1)
    rays_a = rays_a / jnp.linalg.norm(rays_a, axis=-1, keepdims=True)
    rays_b = rays_a

    rans_fn = jax.jit(
        lambda ra, rb, mask, key: ransac_translation(
            ra, rb, jnp.eye(3), mask, key, num_hyps=512, thresh=0.02
        )
    )
    timeit("ransac (512 hyps)", rans_fn, rays_a, rays_b, m.mask, jax.random.PRNGKey(0))

    imu = jnp.zeros((16, 6))
    dt = jnp.full((16,), 0.005)
    q0 = jnp.array([1.0, 0, 0, 0])
    mad_fn = jax.jit(lambda q, i, d: madgwick_scan(q, i[:, :3], i[:, 3:], d))
    timeit("madgwick scan (16)", mad_fn, q0, imu, dt)
    pre_fn = jax.jit(lambda i, d: preintegrate(i[:, :3], i[:, 3:], d))
    timeit("preintegrate (16)", pre_fn, imu, dt)


if __name__ == "__main__":
    main()
