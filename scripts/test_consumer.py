"""Discriminate the extract+match slowdown: constants vs consumer-of-desc."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    cache = "/root/repo/.jax_cache"
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.engine import VIOEngine
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.frontend.match import match_descriptors
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
        print(f"{name:<44} {(time.perf_counter()-t0)/reps*1000:8.2f} ms")

    @jax.jit
    def c1(img):
        f = extract_features(img, cfg)
        return jnp.sum(f.desc)

    timeit("extract + sum(desc)", c1, img)

    @jax.jit
    def c2(img):
        f = extract_features(img, cfg)
        return jnp.dot(f.desc, f.desc.T, preferred_element_type=jnp.float32)

    timeit("extract + self matmul (no constants)", c2, img)

    @jax.jit
    def c3(img, kd, km):
        f = extract_features(img, cfg)
        return match_descriptors(kd, km, f.desc, f.mask, ratio=0.8)

    timeit("extract + match (kf as ARGS)", c3, img, kf.desc, kf.mask)


if __name__ == "__main__":
    main()
