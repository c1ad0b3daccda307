"""Nonlinear-diffusion scale space (the KAZE/AKAZE detector family's core).

The reference offers KAZE and AKAZE through its detector factory
(/root/reference/src/Camera.cpp:94-113). What distinguishes that family from
SIFT/SURF is not the interest measure (Hessian determinant, which we already
have) but the SCALE SPACE: instead of Gaussian blurring — which smears
object boundaries isotropically — KAZE evolves the image by Perona-Malik
nonlinear diffusion, which smooths interiors while *preserving edges*, and
detects on that evolution.

TPU-first formulation:
  - The evolution is a fixed, statically-unrolled sequence of explicit
    diffusion steps with FED (Fast Explicit Diffusion) step sizes — each
    step is a handful of rolls/multiplies over the image that XLA fuses;
    no data-dependent iteration counts.
  - Octave structure follows AKAZE: evolve at the current resolution, then
    2x2-mean downsample (exactly `pyramid.build_pyramid`'s operator, so the
    output levels are shape-compatible drop-ins for the Gaussian pyramid —
    detection, description, and matching run unchanged on top).
  - The contrast parameter k is the KAZE 70th-percentile gradient-magnitude
    statistic, computed with one jnp.quantile (fixed-shape sort).

Usage: FrontendConfig(scale_space="nonlinear", detector="hessian") is the
KAZE analog; (scale_space="nonlinear", detector="fast", descriptor="brief")
is the AKAZE analog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vislam_tpu.frontend.pyramid import gaussian_blur, scharr_gradients


def contrast_factor(image, percentile: float = 70.0, presmooth: float = 1.0):
    """KAZE's contrast parameter k: the given percentile of the gradient
    magnitude of the presmoothed image (over pixels with nonzero gradient,
    approximated here by the plain quantile — identical in practice on
    natural images).

    TPU path (round 4): the gradient field comes from the fused Pallas
    response kernel (XLA single-channel convs cost ~0.8 ms each here), and
    the quantile sorts a 4x-downsampled field (a 360k-element sort costs
    ~2 ms; the 70th percentile of the pooled field is statistically
    indistinguishable for a smoothing heuristic — k only steers the
    conductivity scale)."""
    if jax.default_backend() == "tpu" and presmooth == 1.0:
        from vislam_tpu.ops.harris_kernel import harris_nms_auto

        _, mag2 = harris_nms_auto(image.astype(jnp.float32),
                                  detector="_gradmag2")
        h, w = mag2.shape
        pooled = mag2[: h - h % 4, : w - w % 4].reshape(
            h // 4, 4, w // 4, 4).mean(axis=(1, 3))
        k = jnp.sqrt(jnp.maximum(jnp.quantile(pooled, percentile / 100.0),
                                 0.0))
        return jnp.maximum(k, 1e-3)
    sm = gaussian_blur(image, presmooth)
    gx, gy = scharr_gradients(sm)
    mag = jnp.sqrt(gx * gx + gy * gy)
    k = jnp.quantile(mag, percentile / 100.0)
    return jnp.maximum(k, 1e-3)


def pm_g2(gx, gy, k):
    """Perona-Malik g2 conductivity: 1 / (1 + |grad L|^2 / k^2).

    Favors wide regions over smaller ones — the KAZE default.
    """
    return 1.0 / (1.0 + (gx * gx + gy * gy) / (k * k))


def fed_tau_steps(T: float, tau_max: float = 0.25):
    """FED cycle step sizes reaching total diffusion time T.

    Explicit 2D diffusion is stable for tau <= 0.25; FED takes n inner steps
    with varying tau_j (some far above the stability limit — stable as a
    CYCLE) whose sum is T. Returns a python list (static unroll).
    """
    n = int(np.ceil(np.sqrt(3.0 * T / tau_max + 0.25) - 0.5 - 1e-8)) + 1
    c = 1.0 / (4.0 * n + 2.0)
    taus = [tau_max / (2.0 * np.cos(np.pi * (2 * j + 1) * c) ** 2)
            for j in range(n)]
    scale = T / sum(taus)
    return [float(t * scale) for t in taus]


def _diffusion_step(L, g, tau):
    """One explicit step of dL/dt = div(g grad L), zero-flux boundaries.

    Half-point conductivities by neighbor averaging; neighbors via pad+slice
    (edge replicate == zero flux), all fusable elementwise work.
    """
    Lp = jnp.pad(L, 1, mode="edge")
    gp = jnp.pad(g, 1, mode="edge")

    def nb(a, dv, du):
        return a[1 + dv:a.shape[0] - 1 + dv, 1 + du:a.shape[1] - 1 + du]

    flux = jnp.zeros_like(L)
    for dv, du in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        Ln = nb(Lp, dv, du)
        gn = nb(gp, dv, du)
        flux = flux + 0.5 * (g + gn) * (Ln - L)
    return L + tau * flux


def evolve(L, k, T: float, tau_max: float = 0.25):
    """FED-evolve image L by diffusion time T with contrast k.

    Conductivity is recomputed from the (lightly smoothed) current image at
    every step, as in KAZE. On the TPU backend the whole FED cycle runs as
    ONE Pallas kernel (ops/fed_kernel.py): the XLA formulation pays ~4
    single-channel convs PER STEP at ~0.8 ms each on this runtime
    (BENCH_NOTES round 4) — tens of ms per octave; the fused kernel is one
    HBM round-trip."""
    taus = fed_tau_steps(T, tau_max)
    if jax.default_backend() == "tpu":
        from vislam_tpu.ops.fed_kernel import fed_evolve_pallas

        return fed_evolve_pallas(L, jnp.asarray(k, jnp.float32),
                                 tuple(taus))
    for tau in taus:
        gx, gy = scharr_gradients(gaussian_blur(L, 1.0, radius=2))
        g = pm_g2(gx, gy, k)
        L = _diffusion_step(L, g, tau)
    return L


def nonlinear_scale_space(
    image,
    num_levels: int,
    sigma0: float = 1.6,
    presmooth: float = 1.0,
    contrast_pct: float = 70.0,
):
    """AKAZE-style octave scale space; drop-in replacement for build_pyramid.

    Level i approximates evolution scale sigma0 * 2^i, computed by FED
    evolution at the octave's own resolution (diffusion time in pixel^2
    units divides by 4 per downsample, so each octave advances the LOCAL
    sigma from sigma0 to 2*sigma0: dT = 0.5 * (4 - 1) * sigma0^2). Levels
    are downsampled with the same crop + 2x2-mean operator as
    pyramid.build_pyramid, so shapes match the Gaussian pyramid exactly.
    """
    k = contrast_factor(image, contrast_pct, presmooth)
    L = gaussian_blur(image, presmooth)
    # Reach sigma0 from the presmooth level: dT = 0.5 (sigma0^2 - ps^2).
    L = evolve(L, k, 0.5 * max(sigma0 ** 2 - presmooth ** 2, 0.1))
    levels = [L]
    dT = 0.5 * 3.0 * sigma0 ** 2  # sigma0 -> 2*sigma0 at local resolution
    for _ in range(num_levels - 1):
        L = evolve(L, k, dT)
        h, w = L.shape
        L = L[: h - h % 2, : w - w % 2]
        L = L.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
        # AKAZE shrinks the contrast parameter across octaves (gradients
        # weaken after smoothing+downsampling).
        k = k * 0.75
        levels.append(L)
    return levels
