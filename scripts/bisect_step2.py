"""Cumulative reconstruction of the engine step with ALL data as arguments —
isolates which composition stage introduces the anomalous ~30 ms."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from vislam_tpu import lie
    from vislam_tpu.calib.camera_model import unproject_pixels
    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.frontend.match import match_descriptors
    from vislam_tpu.frontend.pose import (
        ransac_translation, resolve_direction_sign, rotation_compensated_disparity,
    )
    from vislam_tpu.inertial import madgwick_scan, preintegrate
    from vislam_tpu.utils.config import FrontendConfig

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    calib = seq["calib"]
    eng = VIOEngine(calib)
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0])
    img = jnp.asarray(seq["images"][1], jnp.float32)
    imu = jnp.zeros((16, 6))
    dtv = jnp.full((16,), 0.005)
    key = jax.random.PRNGKey(0)
    cfg = FrontendConfig()
    fx, fy, cx, cy = calib.fx, calib.fy, calib.cx, calib.cy
    kf = state.kf_feat

    def timeit(name, fn, *args, reps=15):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:<44} {(time.perf_counter()-t0)/reps*1000:8.2f} ms", flush=True)

    @jax.jit
    def v1(img, imu, dtv, q0, kd, km, kuv):
        q, _ = madgwick_scan(q0, imu[:, :3], imu[:, 3:], dtv)
        pre = preintegrate(imu[:, :3], imu[:, 3:], dtv)
        f = extract_features(img, cfg)
        m = match_descriptors(kd, km, f.desc, f.mask, uv_a=kuv, ratio=0.8)
        return q, pre.dp, m.idx_b, m.mask

    timeit("v1 inertial+extract+match(dedup)", v1, img, imu, dtv,
           jnp.array([1.0, 0, 0, 0]), kf.desc, kf.mask, kf.uv)

    @jax.jit
    def v2(img, imu, dtv, q0, kd, km, kuv, key):
        q, _ = madgwick_scan(q0, imu[:, :3], imu[:, 3:], dtv)
        pre = preintegrate(imu[:, :3], imu[:, 3:], dtv)
        f = extract_features(img, cfg)
        m = match_descriptors(kd, km, f.desc, f.mask, uv_a=kuv, ratio=0.8)
        uv_j = jnp.take(f.uv, m.idx_b, axis=0)
        ra = unproject_pixels(kuv, fx, fy, cx, cy)
        rb = unproject_pixels(uv_j, fx, fy, cx, cy)
        ra = ra / jnp.linalg.norm(ra, axis=-1, keepdims=True)
        rb = rb / jnp.linalg.norm(rb, axis=-1, keepdims=True)
        R_ji = lie.quat_to_mat(q)
        est = ransac_translation(ra, rb, R_ji, m.mask, key)
        t = resolve_direction_sign(ra, rb, R_ji, est.t_dir, est.inlier_mask)
        disp = rotation_compensated_disparity(kuv, uv_j, m.mask, R_ji, fx, fy, cx, cy)
        return t, disp, pre.dp

    timeit("v2 = v1 + rays+ransac+sign+disp", v2, img, imu, dtv,
           jnp.array([1.0, 0, 0, 0]), kf.desc, kf.mask, kf.uv, key)

    step = jax.jit(eng._build_step())
    timeit("full step", step, state, img, imu, dtv,
           jnp.asarray(0.05, jnp.float32), key)


if __name__ == "__main__":
    main()
