"""Pallas kernels vs their jnp reference implementations (interpret mode on
the CPU test mesh; the same code compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.frontend.detect import harris_response, _nms
from vislam_tpu.frontend.match import match_descriptors
from vislam_tpu.ops.match_kernel import match_descriptors_pallas, match_top2_pallas
from vislam_tpu.ops.harris_kernel import harris_nms_pallas


def _descs(rng, K=128, D=32, invalid_a=5, invalid_b=3):
    a = rng.normal(size=(K, D)).astype(np.float32)
    b = rng.normal(size=(K, D)).astype(np.float32)
    a /= np.linalg.norm(a, axis=-1, keepdims=True)
    b /= np.linalg.norm(b, axis=-1, keepdims=True)
    ma = np.ones(K, bool); ma[K - invalid_a:] = False
    mb = np.ones(K, bool); mb[:invalid_b] = False
    return a, b, ma, mb


def test_match_top2_kernel_matches_numpy(rng):
    a, b, ma, mb = _descs(rng)
    min1, min2, arg1, colarg = match_top2_pallas(
        jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
        interpret=True,
    )
    D = np.linalg.norm(a[:, None] - b[None, :], axis=-1) ** 2
    D[~ma] = 1e9
    D[:, ~mb] = 1e9
    np.testing.assert_allclose(np.asarray(min1), D.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(arg1)[ma], D.argmin(1)[ma])
    D2 = D.copy()
    D2[np.arange(len(D)), D.argmin(1)] = 1e9
    np.testing.assert_allclose(np.asarray(min2)[ma], D2.min(1)[ma], rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(colarg)[mb], D.argmin(0)[mb])


def test_match_pallas_agrees_with_jnp_matcher(rng):
    a, b, ma, mb = _descs(rng, K=256, D=64)
    m_ref = match_descriptors(
        jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
        ratio=0.9, mutual=True,
    )
    m_pal = match_descriptors_pallas(
        jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
        ratio=0.9, mutual=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(m_ref.mask), np.asarray(m_pal.mask))
    sel = np.asarray(m_ref.mask)
    np.testing.assert_array_equal(
        np.asarray(m_ref.idx_b)[sel], np.asarray(m_pal.idx_b)[sel]
    )
    np.testing.assert_allclose(
        np.asarray(m_ref.dist)[sel], np.asarray(m_pal.dist)[sel], rtol=1e-4, atol=1e-5
    )


def test_match_pallas_guided_gate_matches_jnp(rng):
    """The fused gated kernel must agree with the jnp gated matcher exactly."""
    a, b, ma, mb = _descs(rng, K=128, D=32)
    uv_a = rng.uniform(0, 400, (128, 2)).astype(np.float32)
    uv_b = (uv_a + rng.normal(0, 12, (128, 2))).astype(np.float32)
    m_ref = match_descriptors(
        jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
        ratio=0.9, mutual=True, uv_pred=jnp.asarray(uv_a),
        uv_b=jnp.asarray(uv_b), gate_radius=20.0,
    )
    # Fused gated kernel + the shared filter chain (as match.py applies it).
    K = a.shape[0]
    min1, min2, arg1, colarg = match_top2_pallas(
        jnp.asarray(a), jnp.asarray(ma), jnp.asarray(b), jnp.asarray(mb),
        uv_pred=jnp.asarray(uv_a), uv_b=jnp.asarray(uv_b), gate_radius=20.0,
        interpret=True,
    )
    ok = np.asarray(ma) & (np.asarray(min1) < 5e8)
    ok &= np.asarray(min1) < 0.81 * np.maximum(np.asarray(min2), 1e-12)
    ok &= np.asarray(colarg)[np.clip(np.asarray(arg1), 0, K - 1)] == np.arange(K)
    np.testing.assert_array_equal(np.asarray(m_ref.mask), ok)
    sel = ok
    np.testing.assert_array_equal(
        np.asarray(m_ref.idx_b)[sel], np.asarray(arg1)[sel]
    )


def test_harris_kernel_matches_jnp_pipeline():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=2, n_landmarks=150, seed=4))
    img = jnp.asarray(seq["images"][0], jnp.float32)
    full_ref = harris_response(img)
    ref = np.asarray(_nms(full_ref, radius=2))
    pal, pal_resp = harris_nms_pallas(img, interpret=True)
    pal = np.asarray(pal)
    # Raw-response output (used by subpixel refinement) matches the jnp field.
    inner = np.s_[16:-16, 16:-16]
    np.testing.assert_allclose(
        np.asarray(pal_resp)[inner], np.asarray(full_ref)[inner],
        rtol=5e-3, atol=5e-2,
    )
    # Compare peak sets in the interior (border handling differs by design).
    interior = np.s_[16:-16, 16:-16]
    ref_peaks = np.isfinite(ref[interior]) & (ref[interior] > 1.0)
    pal_peaks = np.isfinite(pal[interior]) & (pal[interior] > 1.0)
    # Peak sets should agree almost everywhere (tiny numeric differences can
    # shift an NMS tie by a pixel).
    agree = (ref_peaks == pal_peaks).mean()
    assert agree > 0.995, agree
    both = ref_peaks & pal_peaks
    np.testing.assert_allclose(
        ref[interior][both], pal[interior][both], rtol=5e-3, atol=5e-2
    )


def test_response_kernel_families_match_jnp():
    """The generalized Pallas response kernel (round 4: dog/hessian/fast in
    addition to shi_tomasi/harris) must reproduce the XLA response family
    (frontend/detect.DETECTOR_RESPONSES) away from image borders (the halo
    absorbs wrap; borders are masked downstream by the detector)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vislam_tpu.frontend.detect import DETECTOR_RESPONSES, _nms
    from vislam_tpu.ops.harris_kernel import harris_nms_pallas

    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.uniform(0, 255, (240, 376)).astype(np.float32))
    for det, fn in DETECTOR_RESPONSES.items():
        ref = np.asarray(fn(img))
        nms_p, resp_p = harris_nms_pallas(img, interpret=True, detector=det)
        resp_p = np.asarray(resp_p)
        b = 12
        scale = max(1.0, np.abs(ref[b:-b, b:-b]).max())
        err = np.abs(resp_p[b:-b, b:-b] - ref[b:-b, b:-b]).max() / scale
        assert err < 1e-4, (det, err)
        # NMS field marks exactly the 5x5 local maxima of the response.
        nms_ref = np.asarray(_nms(jnp.asarray(ref), 2))
        agree = (np.isneginf(np.asarray(nms_p)[b:-b, b:-b])
                 == np.isneginf(nms_ref[b:-b, b:-b]))
        assert agree.mean() > 0.999, (det, agree.mean())


def test_fed_kernel_matches_evolve_and_vmaps():
    """The fused FED octave kernel must reproduce frontend.nonlinear.evolve
    for interior pixels, including under a leading batch (the batch/multi-
    sequence runners jax.vmap the engine step; the custom_vmap rule reroutes
    batching onto the kernel grid — advisor round 4, same treatment as
    harris_nms_auto)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vislam_tpu.frontend.nonlinear import evolve, fed_tau_steps
    from vislam_tpu.ops.fed_kernel import fed_evolve_pallas

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 1, (240, 320)).astype(np.float32))
    taus = tuple(fed_tau_steps(3.84))
    ref0 = np.asarray(evolve(img, 0.1, 3.84))
    ref1 = np.asarray(evolve(img * 0.5, 0.2, 3.84))
    out = jax.vmap(
        lambda im, k: fed_evolve_pallas(im, k, taus, interpret=True)
    )(jnp.stack([img, img * 0.5]), jnp.asarray([0.1, 0.2], np.float32))
    out = np.asarray(out)
    b = 24
    assert np.abs(out[0, b:-b, b:-b] - ref0[b:-b, b:-b]).max() < 1e-4
    assert np.abs(out[1, b:-b, b:-b] - ref1[b:-b, b:-b]).max() < 1e-4
