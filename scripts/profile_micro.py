"""Micro-profile of detect/describe SUB-stages, fetch-forced trip-differential.

Round-4 diagnosis: profile_stages.py shows detect 17.6 ms and describe
16.2 ms on-device — 34 of the step's ~31 ms/frame — while match/ransac/
pyramid are all <= 1.3 ms. This script splits those two stages into their
constituent ops to find the slow ones. Methodology: each candidate runs as
the body of a lax.scan (carry-dependent so trips serialize), timed
dispatch -> host fetch at two trip counts; the differential is the real
per-iteration device time (the only honest timing on this backend — see
BENCH_NOTES "the enqueue illusion").
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
K = 512
S = 256  # descriptor samples


def timeit(name, make_body, *args, n_lo=4, n_hi=36, reps=3):
    """make_body(carry, *args) -> new carry (same pytree). Times marginal."""

    @partial(jax.jit, static_argnames=("n",))
    def run(c0, n, *a):
        def body(c, _):
            return make_body(c, *a), None
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jax.tree.leaves(c)[0].ravel()[:2]

    c0 = args[0]
    rest = args[1:]
    ts = {}
    for n in (n_lo, n_hi):
        np.asarray(run(c0, n, *rest))  # compile+settle
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(c0, n, *rest))
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    us = (ts[n_hi] - ts[n_lo]) / (n_hi - n_lo) * 1e6
    print(f"{name:44s} {us:10.1f} us/iter")
    return us


def main():
    print("backend:", jax.default_backend())
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (H, W), jnp.float32) * 255.0
    uvf = jnp.stack([
        jax.random.uniform(key, (K,), minval=20.0, maxval=W - 20.0),
        jax.random.uniform(jax.random.fold_in(key, 1), (K,), minval=20.0,
                           maxval=H - 20.0),
    ], -1)
    coords = uvf[:, None, :] + jax.random.normal(
        jax.random.fold_in(key, 2), (K, S, 2)) * 8.0  # (K,S,2)

    from vislam_tpu.frontend.pyramid import scharr_gradients, gaussian_blur
    from vislam_tpu.frontend.detect import (
        harris_response, _nms, _grid_topk, _subpixel_refine, _orientations)
    from vislam_tpu.frontend.descriptor import _bilinear_gather

    # ---------------- detect sub-stages
    timeit("response (shi-tomasi, f32)",
           lambda c: harris_response(c) * 1e-6 + c, img)
    timeit("nms (reduce_window r=2)",
           lambda c: _nms(c, 2) * 1e-6 + c, img)

    def topk_stage(c):
        uv, score = _grid_topk(c, 8, 8, 8, 12)
        return c + score[0] * 1e-9
    timeit("grid_topk (top_k 64x5640 k=8)", topk_stage, img)

    def subpix_stage(c, resp):
        uv2 = _subpixel_refine(resp, c)
        return c * 0.999 + uv2 * 0.001
    timeit("subpixel refine (9 gathers of 512)", subpix_stage, uvf, img)

    def orient_stage(c, im):
        a = _orientations(im, c)
        return c + a[:, None] * 1e-9
    timeit("orientations (blur+grad+2 gathers)", orient_stage, uvf, img)

    # ---------------- describe sub-stages
    gx, gy = scharr_gradients(gaussian_blur(img, 0.6, radius=2))

    def gather_stage(c, g):
        s = _bilinear_gather(g, c)   # (K,S) from (H,W): 4 x 131072-gather
        return c + s[..., None] * 1e-9
    timeit("bilinear_gather KxS=131072 (x1 image)", gather_stage, coords, gx)

    def both_gather(c, a, b):
        s1 = _bilinear_gather(a, c)
        s2 = _bilinear_gather(b, c)
        return c + (s1 + s2)[..., None] * 1e-9
    timeit("bilinear_gather x2 images", both_gather, coords, gx, gy)

    # Histogram/einsum part of describe (post-gather math)
    gxs = _bilinear_gather(gx, coords)
    gys = _bilinear_gather(gy, coords)

    def hist_stage(c, gys_):
        from vislam_tpu.frontend.descriptor import _WSP, _NBINS
        mag = jnp.sqrt(c * c + gys_ * gys_ + 1e-12)
        ori = jnp.arctan2(gys_, c)
        obin = (ori / (2.0 * jnp.pi) + 0.5) * _NBINS - 0.5
        o0 = jnp.floor(obin)
        do = obin - o0
        o0i = jnp.mod(o0.astype(jnp.int32), _NBINS)
        o1i = jnp.mod(o0i + 1, _NBINS)
        eye = jnp.eye(_NBINS, dtype=jnp.float32)
        O = (1.0 - do)[..., None] * eye[o0i] + do[..., None] * eye[o1i]
        M = mag[..., None] * O
        desc = jnp.einsum("ksb,sc->kcb", M, jnp.asarray(_WSP),
                          preferred_element_type=jnp.float32)
        return c + desc.reshape(K, -1).sum(-1)[:, None] * 1e-9
    timeit("histogram einsum (post-gather)", hist_stage, gxs, gys)

    # ---------------- candidate replacements
    # (a) patch gather: vmapped dynamic_slice (contiguous 24x24 blocks)
    P = 24

    def patch_gather(c, im):
        u0 = jnp.clip(c[:, 0].astype(jnp.int32) - P // 2, 0, W - P)
        v0 = jnp.clip(c[:, 1].astype(jnp.int32) - P // 2, 0, H - P)
        patches = jax.vmap(
            lambda v, u: jax.lax.dynamic_slice(im, (v, u), (P, P))
        )(v0, u0)  # (K, P, P)
        return c + patches[:, 0, :2] * 1e-9
    timeit("patch gather vmap dyn_slice 512x24x24", patch_gather, uvf, img)

    # (b) separable one-hot bilinear within patches (two batched matmuls)
    patches = jax.vmap(
        lambda v, u: jax.lax.dynamic_slice(
            img, (v, u), (P, P)))(
        jnp.clip(uvf[:, 1].astype(jnp.int32) - P // 2, 0, H - P),
        jnp.clip(uvf[:, 0].astype(jnp.int32) - P // 2, 0, W - P))

    def sep_bilinear(c, pat):
        # c: (K,S,2) local float coords in [0,P)
        lu = jnp.clip(c[..., 0] * 0.05 + P / 2, 0.0, P - 1.001)
        lv = jnp.clip(c[..., 1] * 0.05 + P / 2, 0.0, P - 1.001)
        iota = jnp.arange(P, dtype=jnp.float32)
        # A[k,s,p] = bilinear row weight; 2 nonzeros per (k,s)
        av = jnp.maximum(0.0, 1.0 - jnp.abs(lv[..., None] - iota))
        au = jnp.maximum(0.0, 1.0 - jnp.abs(lu[..., None] - iota))
        t1 = jnp.einsum("ksp,kpq->ksq", av, pat,
                        preferred_element_type=jnp.float32)
        samp = jnp.sum(t1 * au, -1)  # (K,S)
        return c + samp[..., None] * 1e-9
    timeit("separable one-hot bilinear (matmul)", sep_bilinear, coords, patches)

    # (c) approx_max_k replacement for grid top_k
    def approx_topk_stage(c):
        resp = c[: 472 * 752].reshape(472, 752) if c.ndim == 1 else c
        cells = c[:472, :704].reshape(8, 59, 8, 88)
        cells = cells.transpose(0, 2, 1, 3).reshape(64, 59 * 88)
        score, idx = jax.lax.approx_max_k(cells, 8)
        return c + score[0, 0] * 1e-9
    timeit("approx_max_k 64x5192 k=8", approx_topk_stage, img)

    # (d) iterated argmax top-k (8 rounds of max+mask)
    def iter_topk_stage(c):
        cells = c[:472, :704].reshape(8, 59, 8, 88)
        cells = cells.transpose(0, 2, 1, 3).reshape(64, 59 * 88)
        x = cells
        tot = 0.0
        for _ in range(8):
            m = jnp.max(x, axis=1)
            am = jnp.argmax(x, axis=1)
            x = jnp.where(jnp.arange(x.shape[1])[None, :] == am[:, None],
                          -jnp.inf, x)
            tot = tot + m[0]
        return c + tot * 1e-9
    timeit("iterated argmax top-k (8 rounds)", iter_topk_stage, img)


if __name__ == "__main__":
    main()
