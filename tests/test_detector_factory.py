"""Detector-factory + binary-descriptor tests.

Role parity with the reference's detector/matcher factories
(/root/reference/src/Camera.cpp:94-138 — SIFT/SURF/ORB/KAZE/AKAZE;
/root/reference/src/MatcherGPU.cpp:16-42 — BF vs BF-Hamming): every
response family must localize its target structure, and steered-BRIEF
matching through the shared MXU matcher must be exactly Hamming-ordered.
"""

import jax.numpy as jnp
import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.frontend import extract_features, match_descriptors
from vislam_tpu.frontend.detect import (
    DETECTOR_RESPONSES,
    dog_response,
    fast_response,
    hessian_response,
)
from vislam_tpu.frontend.binary_desc import (
    BINARY_DIM,
    describe_binary,
    hamming_from_l2sq,
)
from vislam_tpu.utils.config import FrontendConfig


def _square_image(H=96, W=128, top=30, left=40, size=30):
    img = np.zeros((H, W), np.float32)
    img[top:top + size, left:left + size] = 200.0
    return img


def test_fast_response_fires_on_corners_not_edges():
    img = _square_image()
    r = np.asarray(fast_response(jnp.asarray(img)))
    corners = [(30, 40), (30, 69), (59, 40), (59, 69)]
    # Best response within 2 px of each square corner must dominate both a
    # mid-edge point and the flat interior.
    edge = r[30, 55]
    flat = r[45, 55]
    for (v, u) in corners:
        patch = r[v - 2:v + 3, u - 2:u + 3].max()
        assert patch > 50.0, f"FAST missed corner ({v},{u}): {patch}"
    assert edge <= 0.0 + 1e-3, f"FAST fired on an edge: {edge}"
    assert flat <= 0.0 + 1e-3, f"FAST fired on flat texture: {flat}"


def test_blob_responses_localize_blob():
    H, W = 96, 128
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    blob = 200.0 * np.exp(-(((yy - 48) ** 2 + (xx - 64) ** 2) / (2 * 3.0 ** 2)))
    for name, fn in (("dog", dog_response), ("hessian", hessian_response)):
        r = np.array(fn(jnp.asarray(blob)))
        r[:8] = r[-8:] = -1e9  # ignore borders
        r[:, :8] = r[:, -8:] = -1e9
        v, u = np.unravel_index(np.argmax(r), r.shape)
        d = np.hypot(v - 48, u - 64)
        assert d <= 3.0, f"{name} peak at ({v},{u}), {d:.1f}px from blob center"


def test_all_detector_families_run_through_extract_features():
    seq = make_synthetic_sequence(SyntheticConfig(n_frames=1, n_landmarks=200, seed=3))
    img = jnp.asarray(seq["images"][0], jnp.float32)
    for det in DETECTOR_RESPONSES:
        cfg = FrontendConfig(detector=det)
        f = extract_features(img, cfg)
        n = int(np.asarray(f.mask).sum())
        assert n >= 50, f"{det}: only {n} keypoints on textured synthetic frame"
        assert np.isfinite(np.asarray(f.uv)[np.asarray(f.mask)]).all()


def test_brief_l2_is_exact_hamming(rng):
    # Random bit vectors emitted the binary_desc way must match-order by
    # Hamming exactly through the shared L2 matcher.
    K = 32
    bits_a = rng.integers(0, 2, size=(K, BINARY_DIM)).astype(bool)
    bits_b = rng.integers(0, 2, size=(K, BINARY_DIM)).astype(bool)
    s = 1.0 / np.sqrt(BINARY_DIM)
    a = np.where(bits_a, s, -s).astype(np.float32)
    b = np.where(bits_b, s, -s).astype(np.float32)
    # Squared L2 via the matcher's formulation.
    l2sq = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    ham = hamming_from_l2sq(jnp.asarray(l2sq))
    expect = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(np.asarray(ham), expect)


def test_brief_matches_across_translated_frame(rng):
    # Natural-texture scene shifted by a known offset: BRIEF matches through
    # the shared matcher must recover the shift. (The dot-field synthetic
    # scene is adversarial for BRIEF by construction — pairwise intensity
    # comparisons are amplitude-invariant, so identical-shape dots alias;
    # smoothed broadband noise is the fair correctness texture.)
    from vislam_tpu.frontend.pyramid import gaussian_blur

    H, W = 192, 256
    base = rng.normal(size=(H, W)).astype(np.float32)
    img0 = np.asarray(gaussian_blur(jnp.asarray(base), 1.5, radius=4)) * 80.0
    du, dv = 9, 5
    img1 = np.roll(img0, (dv, du), axis=(0, 1))

    cfg = FrontendConfig(descriptor="brief", detector="fast")
    f0 = extract_features(jnp.asarray(img0), cfg)
    f1 = extract_features(jnp.asarray(img1), cfg)
    assert f0.desc.shape[-1] == BINARY_DIM
    m = match_descriptors(f0.desc, f0.mask, f1.desc, f1.mask, ratio=0.9)
    ok = np.asarray(m.mask)
    assert ok.sum() >= 60, f"only {ok.sum()} BRIEF matches"
    uv0 = np.asarray(f0.uv)[ok]
    uv1 = np.asarray(f1.uv)[np.asarray(m.idx_b)[ok]]
    disp = uv1 - uv0
    err = np.linalg.norm(disp - np.array([du, dv]), axis=-1)
    inlier = (err < 2.0).mean()
    assert inlier > 0.85, f"BRIEF shift-recovery inlier rate {inlier:.2f}"


def test_oriented_brief_rotation_invariance(rng):
    # Describe the same physical points in an image and its 90deg-rotated
    # copy (with angles offset by 90deg): descriptors must agree on most bits.
    H = W = 128
    img = rng.normal(size=(H, W)).astype(np.float32)
    # smooth the noise so bilinear sampling under rotation is well-behaved
    from vislam_tpu.frontend.pyramid import gaussian_blur

    img = np.asarray(gaussian_blur(jnp.asarray(img), 2.0, radius=4)) * 50.0
    rot = np.rot90(img, k=-1).copy()  # (v,u) -> (u, H-1-v)

    K = 24
    uv = rng.uniform(30, 98, size=(K, 2)).astype(np.float32)
    angle = rng.uniform(-np.pi, np.pi, size=(K,)).astype(np.float32)
    uv_r = np.stack([H - 1 - uv[:, 1], uv[:, 0]], -1)  # rotated coords
    d0 = np.asarray(describe_binary(jnp.asarray(img), jnp.asarray(uv),
                                    jnp.asarray(angle)))
    d1 = np.asarray(describe_binary(jnp.asarray(rot), jnp.asarray(uv_r),
                                    jnp.asarray(angle + np.pi / 2)))
    agree = (np.sign(d0) == np.sign(d1)).mean()
    assert agree > 0.85, f"steered BRIEF bit agreement under rotation: {agree:.2f}"
