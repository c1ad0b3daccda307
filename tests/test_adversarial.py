"""Adversarial-vision validation: exact-GT scene + matchability parity vs
OpenCV reference algorithmics on identical hard frames (VERDICT round-1 top
item; SURVEY §7 'detector quality vs TPU-friendliness' risk mitigation)."""

import dataclasses

import numpy as np
import pytest

from vislam_tpu.data.adversarial import (
    AdversarialConfig,
    make_adversarial_sequence,
    presets,
)
from vislam_tpu.data.synthetic import synthetic_calib
from vislam_tpu.eval.matchability import (
    opencv_match_pairs,
    repo_match_pairs,
    score_pairs,
)
from vislam_tpu.utils.config import FrontendConfig

_CALIB = synthetic_calib(376, 240)


def _seq(name, n_frames=6, **overrides):
    cfg = dataclasses.replace(presets()[name], n_frames=n_frames, **overrides)
    return make_adversarial_sequence(cfg, _CALIB)


@pytest.fixture(scope="module")
def natural_seq():
    return _seq("natural")


@pytest.fixture(scope="module")
def repetitive_seq():
    return _seq("repetitive")


def test_gt_correspondence_exact(natural_seq):
    """The raycast GT is self-consistent: i->i is identity, i->j->i closes."""
    sc = natural_seq["scene"]
    uv = np.stack(
        np.meshgrid(np.linspace(20, 356, 8), np.linspace(20, 220, 6)), -1
    ).reshape(-1, 2)
    uv_same, valid = sc.gt_correspondence(0, uv, 0)
    assert valid.all()
    assert np.abs(uv_same - uv).max() < 1e-5

    uv_j, valid = sc.gt_correspondence(0, uv, 2)
    uv_back, valid2 = sc.gt_correspondence(2, uv_j[valid], 0)
    err = np.linalg.norm(uv_back[valid2] - uv[valid][valid2], axis=-1)
    assert err.max() < 1e-3


def test_render_has_texture(natural_seq):
    img = natural_seq["images"][0]
    assert img.std() > 20  # dense texture, not a flat field
    # local contrast: high-pass energy (detectors need gradients everywhere)
    hp = img.astype(np.float32) - np.roll(img.astype(np.float32), 1, axis=1)
    assert np.abs(hp).mean() > 2.0


def test_natural_parity_vs_opencv_sift(natural_seq):
    """On dense natural texture the TPU frontend must match OpenCV SIFT:
    at least as many matches/pair and inlier rate within 3 points."""
    scene = natural_seq["scene"]
    repo = score_pairs(scene, repo_match_pairs(natural_seq))
    sift = score_pairs(scene, opencv_match_pairs(natural_seq, kind="sift"))
    assert repo.matches_per_pair >= sift.matches_per_pair
    assert repo.inlier_rate >= sift.inlier_rate - 0.03
    assert repo.inlier_rate > 0.9


def test_illum_and_blur_robust():
    """Illumination drift and motion blur must not break the frontend
    (descriptor normalization + gradient-based detection handle both)."""
    for name in ("illum", "blur"):
        seq = _seq(name)
        r = score_pairs(seq["scene"], repo_match_pairs(seq))
        assert r.inlier_rate > 0.9, (name, r)
        assert r.matches_per_pair > 100, (name, r)


def test_repetitive_guided_beats_reference(repetitive_seq):
    """Brick walls: ungated appearance matching degrades for everyone; the
    blob detector + IMU-rotation guided gate must (a) beat the ungated
    variant decisively and (b) beat OpenCV SIFT's inlier rate, with more
    matches — the structural advantage of having inertial prediction."""
    scene = repetitive_seq["scene"]
    dog = FrontendConfig(detector="dog")
    ungated = score_pairs(scene, repo_match_pairs(repetitive_seq, dog))
    gated = score_pairs(scene,
                        repo_match_pairs(repetitive_seq, dog, gate_px=30.0))
    sift = score_pairs(scene, opencv_match_pairs(repetitive_seq, kind="sift"))
    assert gated.inlier_rate > ungated.inlier_rate + 0.15
    assert gated.inlier_rate >= sift.inlier_rate
    assert gated.inliers_per_pair >= 3 * max(sift.inliers_per_pair, 1.0)
    assert gated.inlier_rate > 0.85


def test_occlusion_scoring(natural_seq):
    """Matches on independently moving occluders must be scored as outliers:
    rate drops vs the occluder-free scene, but GT-valid matches stay tight."""
    seq = _seq("occlusion")
    r = score_pairs(seq["scene"], repo_match_pairs(seq))
    clean = score_pairs(natural_seq["scene"], repo_match_pairs(natural_seq))
    assert r.inlier_rate < clean.inlier_rate - 0.05
    assert r.inlier_rate > 0.4
    assert r.mean_px_err < 3.0  # static-surface matches are still accurate


def test_vio_on_adversarial_imagery():
    """Full engine (reference GT-scale parity mode) on hard imagery: the
    trajectory must stay sane on the combined-lite regime."""
    from vislam_tpu.eval import run_vio_sequence

    cfg = AdversarialConfig(
        n_frames=12, illum_gain_amp=0.2, illum_shade_amp=0.2,
        blur_samples=3, n_occluders=2, noise_sigma=3.0,
        gyro_noise=0.002, accel_noise=0.02,
    )
    seq = make_adversarial_sequence(cfg)  # full 752x480 (cached engine shapes)
    r = run_vio_sequence(seq, gt_scale=True)
    assert np.isfinite(r["poses"]).all()
    assert r["ate"] < 0.25, r["ate"]
