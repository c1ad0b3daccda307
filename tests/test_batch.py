"""Scan-mode and batched/sharded sequence-runner tests: scan mode must
reproduce streaming-mode trajectories; the sharded batch must match vmap."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from vislam_tpu.data import SyntheticConfig, make_synthetic_sequence
from vislam_tpu.engine import (
    VIOEngine,
    make_sequence_inputs,
    run_batch_scan,
    run_sequence_scan,
)
from vislam_tpu.eval import ate_rmse


@pytest.fixture(scope="module")
def seq():
    return make_synthetic_sequence(SyntheticConfig(n_frames=24, n_landmarks=250, seed=3))


def _init(eng, seq):
    return eng.initialize(
        seq["images"][0], q_wb0=seq["gt_quat"][0],
        v_w0=seq["gt_vel"][0], p_w0=seq["gt_pos"][0],
    )


def test_scan_matches_streaming(seq):
    eng = VIOEngine(seq["calib"], seed=0)
    state0 = _init(eng, seq)
    inputs = make_sequence_inputs(seq)
    final, results = run_sequence_scan(eng, state0, inputs,
                                       kf_gt_pos0=seq["gt_pos"][0])
    scan_pos = np.asarray(results.p_wc)

    # Streaming with the same per-frame keys (fold_in of the same base key).
    state = state0
    last_kf = 0
    stream_pos = []
    step = jax.jit(eng._build_step())
    base = jax.random.PRNGKey(0)
    for n, j in enumerate(range(1, 24)):
        lo, hi = (j - 1) * 10, j * 10
        imu = np.zeros((16, 6), np.float32)
        imu[:10] = np.concatenate([seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1)
        dt = np.zeros(16, np.float32)
        dt[:10] = 1 / 200.0
        gt_norm = float(np.linalg.norm(seq["gt_pos"][j] - seq["gt_pos"][last_kf]))
        key = jax.random.fold_in(base, n)
        state, res = step(state, jnp.asarray(seq["images"][j], jnp.float32),
                          jnp.asarray(imu), jnp.asarray(dt),
                          jnp.asarray(gt_norm, jnp.float32), key)
        if bool(res.is_keyframe):
            last_kf = j
        stream_pos.append(np.asarray(res.p_wc))
    np.testing.assert_allclose(scan_pos, np.array(stream_pos), atol=1e-4)


def test_scan_trajectory_quality(seq):
    eng = VIOEngine(seq["calib"])
    state0 = _init(eng, seq)
    inputs = make_sequence_inputs(seq)
    _, results = run_sequence_scan(eng, state0, inputs, kf_gt_pos0=seq["gt_pos"][0])
    ate = ate_rmse(np.asarray(results.p_wc), seq["gt_pos"][1:24], align=False)
    assert ate < 0.5, ate
    assert int(np.asarray(results.is_keyframe).sum()) > 3


def test_batch_scan_two_sequences(seq):
    seq2 = make_synthetic_sequence(SyntheticConfig(n_frames=24, n_landmarks=250, seed=9))
    eng = VIOEngine(seq["calib"])
    s1 = _init(eng, seq)
    s2 = _init(eng, seq2)
    states = jax.tree.map(lambda a, b: jnp.stack([a, b]), s1, s2)
    i1 = make_sequence_inputs(seq)
    i2 = make_sequence_inputs(seq2)
    inputs = jax.tree.map(
        lambda a, b: jnp.stack([a, b]) if a.ndim > 0 else a, i1, i2
    )
    kf0 = jnp.stack([jnp.asarray(seq["gt_pos"][0], jnp.float32),
                     jnp.asarray(seq2["gt_pos"][0], jnp.float32)])
    finals, results = run_batch_scan(eng, states, inputs, kf0)
    assert results.p_wc.shape == (2, 23, 3)
    a1 = ate_rmse(np.asarray(results.p_wc[0]), seq["gt_pos"][1:24], align=False)
    a2 = ate_rmse(np.asarray(results.p_wc[1]), seq2["gt_pos"][1:24], align=False)
    assert a1 < 0.6 and a2 < 0.6, (a1, a2)


def test_batch_sharded_matches_vmap(seq):
    from vislam_tpu.parallel import make_mesh
    from vislam_tpu.parallel.batch_runner import run_batch_sharded

    B = 8
    seqs = [
        make_synthetic_sequence(SyntheticConfig(n_frames=10, n_landmarks=150, seed=s))
        for s in range(B)
    ]
    eng = VIOEngine(seqs[0]["calib"])
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[_init(eng, s) for s in seqs])
    inps = [make_sequence_inputs(s) for s in seqs]
    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs) if xs[0].ndim > 0 else xs[0], *inps
    )
    kf0 = jnp.stack([jnp.asarray(s["gt_pos"][0], jnp.float32) for s in seqs])

    f_v, r_v = run_batch_scan(eng, states, inputs, kf0)
    mesh = make_mesh(8, axis_names=("seq",))
    f_s, r_s = run_batch_sharded(eng, states, inputs, kf0, mesh)
    np.testing.assert_allclose(
        np.asarray(r_s.p_wc), np.asarray(r_v.p_wc), atol=1e-4
    )
    # Outputs really are sharded over the mesh.
    assert len(r_s.p_wc.addressable_shards) == 8
