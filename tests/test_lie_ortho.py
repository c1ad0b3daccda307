"""Regression test for the orthogonality-doubling divergence.

The engine's relative-pose composition contains R_kf @ R_kf^T terms; any
orthogonality error in the anchor rotation doubles per keyframe without
re-projection onto SO(3) (measured: 1e-7 seed -> 484 after 39 synthetic
keyframes, positions diverging to 1e5 m). lie.orthonormalize must crush the
error quadratically, and long compositions must stay bounded."""

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rsp

from vislam_tpu import lie


def test_orthonormalize_small_error():
    R = Rsp.from_rotvec([0.3, -0.5, 0.8]).as_matrix().astype(np.float32)
    E = 1e-3 * np.random.default_rng(0).standard_normal((3, 3)).astype(np.float32)
    out = np.asarray(lie.orthonormalize(jnp.asarray(R + E)))
    err = np.abs(out.T @ out - np.eye(3)).max()
    assert err < 1e-6, err
    # Still close to the original rotation.
    assert np.abs(out - R).max() < 5e-3


def test_orthonormalize_batched():
    rng = np.random.default_rng(1)
    R = Rsp.random(16, random_state=2).as_matrix().astype(np.float32)
    R = R + 1e-4 * rng.standard_normal(R.shape).astype(np.float32)
    out = np.asarray(lie.orthonormalize(jnp.asarray(R)))
    prod = np.einsum("nji,njk->nik", out, out)
    assert np.abs(prod - np.eye(3)).max() < 1e-6


def test_error_doubling_composition_stays_bounded():
    """Simulate the engine's anchor composition pattern for 200 'keyframes'."""
    rng = np.random.default_rng(3)
    kf = Rsp.random(random_state=4).as_matrix().astype(np.float32)
    for _ in range(200):
        R_imu = Rsp.random(random_state=None).as_matrix().astype(np.float32)
        # R_new = (R_imu^T kf kf^T)^T  — the pattern that doubles error.
        R_new = (R_imu.T @ kf @ kf.T).T
        kf = np.asarray(lie.orthonormalize(jnp.asarray(R_new)))
    err = np.abs(kf.T @ kf - np.eye(3)).max()
    assert err < 1e-5, err
