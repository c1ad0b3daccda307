"""Keyframe-map persistence (backend/mapio.py): save/load round-trip and
cross-session relocalization against a loaded map."""

import subprocess
import sys

import numpy as np
import jax.numpy as jnp

from vislam_tpu.backend.mapio import load_map, save_map
from vislam_tpu.backend.reloc import attempt_relocalization
from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.frontend.features import extract_features
from vislam_tpu.utils.config import FrontendConfig

from tests.test_reloc import _gt_record


def test_map_roundtrip_and_cross_session_reloc(tmp_path):
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=36, n_landmarks=300, seed=0))
    calib = seq["calib"]
    archive = [_gt_record(seq, j) for j in range(0, 30, 3)]
    path = str(tmp_path / "map.npz")
    save_map(path, archive)
    loaded = load_map(path)
    assert len(loaded) == len(archive)
    for a, b in zip(archive, loaded):
        assert a.frame_index == b.frame_index
        np.testing.assert_array_equal(a.R_wc, b.R_wc)
        np.testing.assert_array_equal(a.desc, b.desc)
        np.testing.assert_array_equal(a.kp_mask, b.kp_mask)

    # A "new session" frame relocalizes against the LOADED map.
    f = extract_features(jnp.asarray(seq["images"][20], jnp.float32),
                         FrontendConfig())
    r = attempt_relocalization(
        np.asarray(f.uv), np.asarray(f.desc), np.asarray(f.mask),
        loaded, calib.fx, calib.fy, calib.cx, calib.cy,
    )
    assert r.success
    assert np.linalg.norm(r.p_wc - seq["gt_pos"][20]) < 0.05


def test_cli_save_then_load_map(tmp_path):
    """CLI round-trip: --save-map in one run, --load-map in the next."""
    mp = str(tmp_path / "m.npz")
    out1 = str(tmp_path / "a.csv")
    out2 = str(tmp_path / "b.csv")
    r1 = subprocess.run(
        [sys.executable, "-m", "vislam_tpu.cli", "--synthetic", "16",
         "--output", out1, "--cpu", "--save-map", mp],
        capture_output=True, text=True, cwd="/root/repo", timeout=560,
    )
    assert r1.returncode == 0, r1.stdout + r1.stderr
    assert "map saved" in r1.stdout
    assert len(load_map(mp)) >= 2
    r2 = subprocess.run(
        [sys.executable, "-m", "vislam_tpu.cli", "--synthetic", "16",
         "--output", out2, "--cpu", "--load-map", mp, "--reloc"],
        capture_output=True, text=True, cwd="/root/repo", timeout=560,
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    assert "loaded map" in r2.stdout
