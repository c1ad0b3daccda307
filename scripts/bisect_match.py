"""Narrow the extract+match slowdown: add matcher stages one at a time."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
    from vislam_tpu.frontend.match import match_descriptors, _top2_min
    from vislam_tpu.utils.config import FrontendConfig

    seq = make_synthetic_sequence(SyntheticConfig(n_frames=4, n_landmarks=300, seed=0))
    eng = VIOEngine(seq["calib"])
    state = eng.initialize(seq["images"][0], q_wb0=seq["gt_quat"][0])
    img = jnp.asarray(seq["images"][1], jnp.float32)
    cfg = FrontendConfig()
    kf = state.kf_feat

    def timeit(name, fn, *args, reps=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:<40} {(time.perf_counter()-t0)/reps*1000:8.2f} ms")

    @jax.jit
    def m_dist(img):
        f = extract_features(img, cfg)
        cross = jnp.dot(kf.desc, f.desc.T, preferred_element_type=jnp.float32)
        return cross

    timeit("extract + dist matmul", m_dist, img)

    @jax.jit
    def m_top2(img):
        f = extract_features(img, cfg)
        sq = jnp.sum(f.desc**2, -1)
        D = sq[None, :] + sq[:, None] - 2 * jnp.dot(
            kf.desc, f.desc.T, preferred_element_type=jnp.float32)
        return _top2_min(D)

    timeit("extract + dist + top2", m_top2, img)

    @jax.jit
    def m_nouv(img):
        f = extract_features(img, cfg)
        return match_descriptors(kf.desc, kf.mask, f.desc, f.mask, ratio=0.8)

    timeit("extract + match (no dedup)", m_nouv, img)

    @jax.jit
    def m_full(img):
        f = extract_features(img, cfg)
        return match_descriptors(kf.desc, kf.mask, f.desc, f.mask,
                                 uv_a=kf.uv, ratio=0.8)

    timeit("extract + match (dedup)", m_full, img)

    # Also: match with desc passed as ARGS (not from extract output).
    f2 = jax.jit(lambda im: extract_features(im, cfg))(img)

    @jax.jit
    def m_args(da, ma, db, mb, uv):
        return match_descriptors(da, ma, db, mb, uv_a=uv, ratio=0.8)

    timeit("match alone (args, dedup)", m_args, kf.desc, kf.mask, f2.desc,
           f2.mask, kf.uv)


if __name__ == "__main__":
    main()
