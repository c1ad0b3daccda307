"""Long-run numerical stability: 200 frames through the on-device scan.

Validates at length what the orthonormalization fix protects (orthogonality
error doubled per keyframe before it — this run has ~100+ keyframes) and
that drift grows sub-linearly rather than blowing up."""

import numpy as np

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import VIOEngine, make_sequence_inputs, run_sequence_scan
from vislam_tpu.eval import ate_rmse


def test_200_frame_scan_stability():
    seq = make_synthetic_sequence(
        SyntheticConfig(n_frames=200, n_landmarks=300, seed=42)
    )
    eng = VIOEngine(seq["calib"])
    state0 = eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )
    inputs = make_sequence_inputs(seq)
    final, results = run_sequence_scan(eng, state0, inputs,
                                       kf_gt_pos0=seq["gt_pos"][0])
    poses = np.asarray(results.p_wc)
    assert np.isfinite(poses).all()

    # Rotation state stays on SO(3) after 100+ keyframe compositions.
    R = np.asarray(final.kf_R_wc)
    assert np.abs(R.T @ R - np.eye(3)).max() < 1e-4
    assert int(final.kf_count) > 50

    gt = seq["gt_pos"][1:200]
    ate = ate_rmse(poses, gt, align=False)
    assert ate < 1.0, ate
    # Second-half drift must not explode relative to first half (sub-linear-ish).
    e = np.linalg.norm(poses - gt, axis=-1)
    assert e[100:].mean() < 6.0 * max(e[:100].mean(), 0.05), (
        e[:100].mean(), e[100:].mean(),
    )
