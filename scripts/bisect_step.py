"""Bisect the engine step: time progressively larger subgraphs to find the
expensive composition."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.frontend.pose import (
        ransac_translation, resolve_direction_sign, rotation_compensated_disparity,
    )
    from vislam_tpu.calib.camera_model import unproject_pixels
    from vislam_tpu.inertial.filters import madgwick_scan
    from vislam_tpu.inertial.preintegration import preintegrate
    from vislam_tpu.utils.config import FrontendConfig

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    calib = seq["calib"]
    eng = VIOEngine(calib)
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0])
    img = jnp.asarray(seq["images"][1], jnp.float32)
    imu = jnp.zeros((16, 6))
    dt = jnp.full((16,), 0.005)
    key = jax.random.PRNGKey(0)
    cfg = FrontendConfig()
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy

    def timeit(name, fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / reps * 1000
        print(f"{name:<36} {ms:8.2f} ms")

    kf = state.kf_feat

    @jax.jit
    def g1(img):
        return extract_features(img, cfg)

    timeit("extract", g1, img)

    @jax.jit
    def g2(img):
        f = extract_features(img, cfg)
        m = match_descriptors(kf.desc, kf.mask, f.desc, f.mask,
                              uv_a=kf.uv, ratio=0.8)
        return m

    timeit("extract+match", g2, img)

    @jax.jit
    def g3(img, key):
        f = extract_features(img, cfg)
        m = match_descriptors(kf.desc, kf.mask, f.desc, f.mask,
                              uv_a=kf.uv, ratio=0.8)
        uv_j = jnp.take(f.uv, m.idx_b, axis=0)
        ra = unproject_pixels(kf.uv, fx, fy, cx, cy)
        rb = unproject_pixels(uv_j, fx, fy, cx, cy)
        ra = ra / jnp.linalg.norm(ra, axis=-1, keepdims=True)
        rb = rb / jnp.linalg.norm(rb, axis=-1, keepdims=True)
        est = ransac_translation(ra, rb, jnp.eye(3), m.mask, key)
        return est

    timeit("extract+match+ransac", g3, img, key)

    @jax.jit
    def g4(img, key):
        f = extract_features(img, cfg)
        m = match_descriptors(kf.desc, kf.mask, f.desc, f.mask,
                              uv_a=kf.uv, ratio=0.8)
        uv_j = jnp.take(f.uv, m.idx_b, axis=0)
        ra = unproject_pixels(kf.uv, fx, fy, cx, cy)
        rb = unproject_pixels(uv_j, fx, fy, cx, cy)
        ra = ra / jnp.linalg.norm(ra, axis=-1, keepdims=True)
        rb = rb / jnp.linalg.norm(rb, axis=-1, keepdims=True)
        est = ransac_translation(ra, rb, jnp.eye(3), m.mask, key)
        t = resolve_direction_sign(ra, rb, jnp.eye(3), est.t_dir, est.inlier_mask)
        disp = rotation_compensated_disparity(kf.uv, uv_j, m.mask, jnp.eye(3),
                                              fx, fy, cx, cy)
        return t, disp

    timeit("…+sign+disparity", g4, img, key)

    @jax.jit
    def g5(img, imu, dt):
        q, _ = madgwick_scan(jnp.array([1.0, 0, 0, 0]), imu[:, :3], imu[:, 3:], dt)
        pre = preintegrate(imu[:, :3], imu[:, 3:], dt)
        return q, pre.dp

    timeit("madgwick+preint", g5, img, imu, dt)

    step = jax.jit(eng._build_step())
    timeit("full step", step, state, img, imu, dt,
           jnp.asarray(0.05, jnp.float32), key)


if __name__ == "__main__":
    main()
