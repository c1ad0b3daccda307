"""Nonlinear-diffusion scale space (KAZE/AKAZE family): FED correctness,
edge preservation vs Gaussian, and end-to-end frontend integration."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from vislam_tpu.frontend.nonlinear import (
    contrast_factor,
    evolve,
    fed_tau_steps,
    nonlinear_scale_space,
)
from vislam_tpu.frontend.pyramid import build_pyramid, gaussian_blur
from vislam_tpu.utils.config import FrontendConfig


def test_fed_steps_sum_to_time():
    for T in (0.5, 1.28, 3.84, 10.0):
        taus = fed_tau_steps(T)
        assert abs(sum(taus) - T) < 1e-6
        assert all(t > 0 for t in taus)


def test_diffusion_conserves_mean_reduces_variance(rng):
    img = jnp.asarray(rng.uniform(0, 255, (64, 80)).astype(np.float32))
    k = contrast_factor(img)
    out = evolve(img, k, T=2.0)
    assert np.isfinite(np.asarray(out)).all()
    # Zero-flux boundaries: total intensity conserved.
    assert abs(float(out.mean() - img.mean())) < 0.05
    # Diffusion smooths: variance strictly decreases on noise.
    assert float(out.var()) < 0.8 * float(img.var())


def test_edge_preserved_better_than_gaussian(rng):
    # Step edge + additive noise. Nonlinear diffusion must keep the edge
    # contrast while killing the noise; a Gaussian blur with comparable
    # interior smoothing smears the edge.
    H, W = 64, 96
    img = np.zeros((H, W), np.float32)
    img[:, W // 2:] = 120.0
    img += rng.normal(0, 6.0, (H, W)).astype(np.float32)
    img_j = jnp.asarray(img)

    k = contrast_factor(img_j)
    T = 0.5 * (3.0 ** 2)  # evolve to sigma ~= 3
    nl = np.asarray(evolve(img_j, k, T))
    ga = np.asarray(gaussian_blur(img_j, 3.0, radius=7))

    # Edge contrast: intensity jump across the edge (2 px apart).
    def edge_jump(a):
        return float(np.mean(a[:, W // 2 + 1] - a[:, W // 2 - 2]))

    # Interior noise (flat region away from the edge).
    def flat_std(a):
        return float(a[8:-8, 8:W // 2 - 12].std())

    assert flat_std(nl) < 0.6 * float(img[8:-8, 8:W // 2 - 12].std())
    assert edge_jump(nl) > 1.3 * edge_jump(ga), (edge_jump(nl), edge_jump(ga))
    assert edge_jump(nl) > 0.85 * 120.0


def test_scale_space_shapes_match_gaussian_pyramid(rng):
    img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
    g = build_pyramid(img, 4)
    n = nonlinear_scale_space(img, 4)
    assert len(g) == len(n)
    for a, b in zip(g, n):
        assert a.shape == b.shape


def test_frontend_kaze_analog_end_to_end(rng):
    # KAZE analog: hessian response on the nonlinear scale space. Textured
    # synthetic image -> valid keypoints with the same fixed capacity as the
    # Gaussian path.
    from vislam_tpu.frontend.features import extract_features

    img = jnp.asarray(
        (rng.uniform(0, 1, (120, 160)) > 0.5).astype(np.float32) * 200.0
    )
    img = gaussian_blur(img, 1.0)
    cfg_g = FrontendConfig(detector="hessian")
    cfg_n = dataclasses.replace(cfg_g, scale_space="nonlinear")
    f_g = extract_features(img, cfg_g)
    f_n = extract_features(img, cfg_n)
    assert f_n.uv.shape == f_g.uv.shape
    assert f_n.desc.shape == f_g.desc.shape
    assert int(f_n.count) > 100
    assert np.isfinite(np.asarray(f_n.desc)).all()
