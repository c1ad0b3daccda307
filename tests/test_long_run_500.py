"""Long-trajectory operation at the KITTI-regime scale (round 5, VERDICT
#6): 500 frames (~5x the previous longest test) through the flagship
GT-free VI-BA scan — the reference's long-outdoor-trajectory config is
KITTI seq 00 with 4,541 frames (/root/reference/calibration/
calibrationKitti.xml); this is the synthetic-oracle analog at suite-
compatible cost. Exercises: keyframe-archive-scale promotion counts (120+
keyframes, far past the orthonormalize-divergence cliff at ~25-45), drift
growth by segment, and a full checkpoint round-trip of the end state
(covering the round-5 bf16 descriptor bank serialization).

The pinned 500-frame EVAL row (scripts/eval_configs.py config 6) runs the
same regime on the host loop with loop correction + relocalization
machinery; this test pins the scan path in CI.
"""

import dataclasses

import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import (
    VIOEngine,
    make_sequence_inputs,
    run_sequence_scan,
)
from vislam_tpu.eval import ate_rmse
from vislam_tpu.utils.config import SystemConfig


def test_500_frame_gt_free_vi_ba_scan():
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=500, n_landmarks=400, seed=42))
    cfg = SystemConfig()
    cfg = dataclasses.replace(cfg, backend=dataclasses.replace(
        cfg.backend, vi_factors=True, refine_in_step=True))
    eng = VIOEngine(seq["calib"], cfg)
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0])
    inputs = make_sequence_inputs(seq, use_gt_scale=False)
    final, results = run_sequence_scan(eng, state0, inputs)
    poses = np.asarray(results.p_wc)
    assert np.isfinite(poses).all()

    # Rotation state is still on SO(3) after 100+ keyframe compositions
    # (CLAUDE.md rule 5: unchecked, error doubles per keyframe).
    R = np.asarray(final.kf_R_wc)
    assert np.abs(R.T @ R - np.eye(3)).max() < 1e-4
    assert int(final.kf_count) > 100

    gt = seq["gt_pos"][1:500]
    ate = ate_rmse(poses, gt, align=False)
    assert ate < 1.2, ate
    # Drift must grow sub-linearly: the last segment's mean error stays
    # within a constant factor of the first's (GT-free monocular VI drifts,
    # but must not blow up).
    e = np.linalg.norm(poses - gt, axis=-1)
    assert e[333:].mean() < 8.0 * max(e[:166].mean(), 0.05), (
        e[:166].mean(), e[333:].mean())

    # Checkpoint round-trip of the end state must be bitwise (deterministic
    # resume depends on it; covers bf16 window-descriptor serialization).
    import tempfile, os

    import jax

    from vislam_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "end.npz")
        save_checkpoint(p, final, 499)
        state2, fidx = load_checkpoint(p)
        assert fidx == 499
        for a, b in zip(jax.tree.leaves(final), jax.tree.leaves(state2)):
            assert np.asarray(a).dtype == np.asarray(b).dtype
            assert np.array_equal(np.asarray(a), np.asarray(b))
