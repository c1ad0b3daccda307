"""Fetch-forced Pallas-vs-XLA measurement for the detect/describe hot spots.

This is the measurement BENCH_NOTES round 3 promised ("RE-MEASURED
fetch-forced below") and VERDICT r03 demanded: trip-differential lax.scan
timing (dispatch -> host fetch barrier) of each candidate at production
shapes.  Replaces the struck round-2 enqueue-based parity table.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

H, W = 480, 752


def timeit(name, make_body, carry0, *args, n_lo=4, n_hi=36, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def run(c0, n, *a):
        def body(c, _):
            return make_body(c, *a), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jax.tree.leaves(c)[0].ravel()[:2]

    ts = {}
    for n in (n_lo, n_hi):
        np.asarray(run(carry0, n, *args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(carry0, n, *args))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    us = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e6
    print(f"{name:48s} {us:10.1f} us/iter")
    return us


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0

    from vislam_tpu.frontend.detect import harris_response, _nms
    from vislam_tpu.ops.harris_kernel import harris_nms_pallas

    # --- response + NMS: XLA f32 / XLA bf16 / Pallas fused
    def xla_f32(c):
        r = _nms(harris_response(c), 2)
        return c + jnp.max(r) * 1e-9

    def xla_bf16(c):
        r = _nms(harris_response(c.astype(jnp.bfloat16)).astype(jnp.float32), 2)
        return c + jnp.max(r) * 1e-9

    def pallas_fused(c):
        nms, resp = harris_nms_pallas(c)
        return c + jnp.max(nms) * 1e-9

    timeit("resp+nms XLA f32", xla_f32, img)
    timeit("resp+nms XLA bf16", xla_bf16, img)
    timeit("resp+nms PALLAS fused", pallas_fused, img)

    # --- full current extract vs pieces
    from vislam_tpu.frontend.features import extract_features
    from vislam_tpu.utils.config import FrontendConfig

    cfg1 = FrontendConfig(levels_used=1)

    def extract_now(c):
        f = extract_features(c, cfg1)
        return c + jnp.sum(f.desc[0]) * 1e-9 + f.uv[0, 0] * 1e-12

    timeit("extract_features single-scale (current)", extract_now, img)

    cfgd = FrontendConfig()

    def extract_def(c):
        f = extract_features(c, cfgd)
        return c + jnp.sum(f.desc[0]) * 1e-9 + f.uv[0, 0] * 1e-12

    timeit("extract_features default multi-scale (cur)", extract_def, img)


if __name__ == "__main__":
    main()
