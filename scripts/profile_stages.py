"""Per-stage device timing of the VIO step's components (run on real TPU).

Identifies where the milliseconds go: detection, description, matching,
RANSAC, inertial scan. Methodology (round-3 forensic rewrite; BENCH_NOTES
"The enqueue illusion"): block_until_ready does NOT wait on this backend —
each stage runs ITERS serial iterations inside ONE program (serializing
carry), and completion is forced by a HOST FETCH of the final carry slice,
the only barrier the backend honors. Honest per-stage costs on this
runtime are ~2-15 ms (per-op execution overhead dominated), not the
microseconds earlier revisions reported.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 64


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.frontend.pyramid import build_pyramid
    from vislam_tpu.frontend.detect import detect_keypoints
    from vislam_tpu.frontend.descriptor import describe_keypoints
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.frontend.pose import ransac_translation
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.inertial import madgwick_scan, preintegrate
    from vislam_tpu.utils.config import FrontendConfig

    print("backend:", jax.devices()[0].platform, flush=True)
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    img = jnp.asarray(seq["images"][1], jnp.float32)
    cfg = FrontendConfig()

    def timeit(name, stage_fn, *args, reps=7):
        """stage_fn(*args) -> scalar proxy; scanned ITERS times serially by
        folding the proxy back into the first (array) argument."""

        def loop(a0, *rest):
            def body(c, _):
                r = stage_fn(c, *rest)
                return c + jnp.asarray(1e-9 * r, c.dtype), r
            return jax.lax.scan(body, a0, None, length=ITERS)

        def force(out):
            c, ys = out
            # Fetch a tiny slice of the final carry: forces the whole chain.
            np.asarray(jax.tree.leaves(c)[0]).ravel()[:1]

        fn = jax.jit(loop)
        force(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(*args))
            ts.append((time.perf_counter() - t0) / ITERS)
        print(f"{name:<30} {min(ts) * 1e6:8.2f} us  (med {np.median(ts) * 1e6:8.2f})",
              flush=True)

    # Stages, each reduced to a scalar that depends on the full computation.
    fcfg_bf16 = cfg

    timeit("pyramid (4 lvls)",
           lambda im: build_pyramid(im.astype(jnp.dtype(cfg.image_dtype)), 4)[3].sum().astype(jnp.float32),
           img)
    timeit("detect (resp+nms+topk)",
           lambda im: detect_keypoints(
               build_pyramid(im.astype(jnp.dtype(cfg.image_dtype)), 4),
               min_score_rel=cfg.min_score,
               use_pallas=cfg.use_pallas_detector).score.sum(),
           img)
    timeit("extract (full, bf16 path)",
           lambda im: (lambda f: f.score.sum() + f.desc.sum())(
               extract_features(im, fcfg_bf16)),
           img)

    fa = extract_features(img, cfg)
    fb = extract_features(jnp.asarray(seq["images"][2], jnp.float32), cfg)
    timeit("describe (512 x SIFT-128)",
           lambda im, uv, a: describe_keypoints(im, uv, a * 0).sum(),
           img, fa.uv, fa.angle)
    timeit("match (MXU+top2+filters)",
           lambda da, ma, db, mb: match_descriptors(da, ma, db, mb, ratio=0.8).dist.sum(),
           fa.desc, fa.mask, fb.desc, fb.mask)

    m = match_descriptors(fa.desc, fa.mask, fb.desc, fb.mask, ratio=0.8)
    rays = jnp.concatenate([fa.uv, jnp.ones((fa.uv.shape[0], 1))], -1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)
    timeit("ransac (512 hyps)",
           lambda ra, rb, mask, k: ransac_translation(
               ra, rb, jnp.eye(3), mask, k, num_hyps=512, thresh=0.02
           )[0].sum(),
           rays, rays, m.mask, key)

    imu = jnp.zeros((16, 6))
    dt = jnp.full((16,), 0.005)
    q0 = jnp.array([1.0, 0, 0, 0])
    timeit("madgwick scan (16)",
           lambda q, i, d: madgwick_scan(q, i[:, :3], i[:, 3:], d)[0].sum(),
           q0, imu, dt)
    timeit("preintegrate (16)",
           lambda i, d: preintegrate(i[:, :3], i[:, 3:], d,
                                     jnp.zeros(3), jnp.zeros(3)).dp.sum(),
           imu, dt)


if __name__ == "__main__":
    main()
