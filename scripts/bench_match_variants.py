"""Fetch-forced Pallas-vs-XLA measurement for the MATCH stage (VERDICT r04
item #3): the round-2 enqueue-based parity table that justified
use_pallas_matcher=False was struck, and after the round-4 frontend fix the
match is the largest single stage of the ~2.1 ms step (~0.9 ms isolated).
This measures both cores fetch-forced (dispatch -> host fetch barrier,
trip-differential lax.scan) at PRODUCTION shapes: K=768 multi-scale default
(and K=512 pinned), D=128, guided gate off and on
(/root/reference/src/MatcherGPU.cpp:44-66 is the reference's device analog).

Run on the real TPU:  python scripts/bench_match_variants.py
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


def timeit(name, make_body, carry0, *args, n_lo=8, n_hi=264, reps=5):
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
    print(f"{name:52s} {us:10.1f} us/iter")
    return us


def bench_k(K: int, key):
    from vislam_tpu.frontend.match import match_descriptors

    D = 128
    k1, k2, k3, k4 = jax.random.split(key, 4)
    desc_a = jax.random.normal(k1, (K, D), jnp.float32)
    desc_a = desc_a / jnp.linalg.norm(desc_a, axis=-1, keepdims=True)
    desc_b = jax.random.normal(k2, (K, D), jnp.float32)
    desc_b = desc_b / jnp.linalg.norm(desc_b, axis=-1, keepdims=True)
    mask = jnp.ones((K,), bool)
    uv_a = jax.random.uniform(k3, (K, 2), jnp.float32) * jnp.array([W, H])
    uv_b = jax.random.uniform(k4, (K, 2), jnp.float32) * jnp.array([W, H])

    def run_match(c, use_pallas, gated):
        m = match_descriptors(
            c, mask, desc_b, mask, uv_a=uv_a, ratio=0.8, mutual=True,
            use_pallas=use_pallas,
            **(dict(uv_pred=uv_a, uv_b=uv_b, gate_radius=60.0)
               if gated else {}),
        )
        # Feed the result back into the carry so the scan body cannot be
        # hoisted as loop-invariant.
        return c + (m.dist[0] + m.idx_b[0]) * 1e-12

    r = {}
    r["xla"] = timeit(f"K={K} match XLA (ratio+mutual)",
                      lambda c: run_match(c, False, False), desc_a)
    r["pallas"] = timeit(f"K={K} match PALLAS fused",
                         lambda c: run_match(c, True, False), desc_a)
    r["xla_gated"] = timeit(f"K={K} match XLA guided-gate",
                            lambda c: run_match(c, False, True), desc_a)
    r["pallas_gated"] = timeit(f"K={K} match PALLAS guided-gate",
                               lambda c: run_match(c, True, True), desc_a)
    return r


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    out = {}
    for K in (512, 768):
        out[K] = bench_k(K, jax.random.fold_in(key, K))
    print()
    for K, r in out.items():
        win = r["xla"] / max(r["pallas"], 1e-9)
        wing = r["xla_gated"] / max(r["pallas_gated"], 1e-9)
        print(f"K={K}: pallas speedup ungated {win:.2f}x, gated {wing:.2f}x")


if __name__ == "__main__":
    main()
