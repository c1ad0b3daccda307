"""Multi-process distributed BA: 2 real processes x 4 virtual CPU devices,
jax.distributed.initialize via parallel.mesh.distributed_init, landmark
sharding over the global ("host", "map") mesh — the Schur psum crosses the
process (DCN-analog) boundary. Numerics must match the single-process solver
on the identical problem (SURVEY §5 distributed-backend requirement;
VERDICT round-1 missing item #3)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same seeded problem solved by the plain single-device BA."""
    from scipy.spatial.transform import Rotation as Rsp

    from tests.test_backend import _make_window, FX, FY, CX, CY
    from vislam_tpu.backend import BAProblem, BAState, bundle_adjust

    rng = np.random.default_rng(1234)
    X, R_cw, t_cw, obs, mask = _make_window(rng, W=5, L=96, noise_px=0.3)
    R_p, t_p = R_cw.copy(), t_cw.copy()
    for k in range(1, len(R_cw)):
        R_p[k] = Rsp.from_rotvec(rng.normal(scale=0.008, size=3)).as_matrix() @ R_cw[k]
        t_p[k] = t_cw[k] + rng.normal(scale=0.04, size=3)
    X_p = X + rng.normal(scale=0.15, size=X.shape)
    import jax.numpy as jnp

    state = BAState(R=jnp.asarray(R_p, jnp.float32),
                    t=jnp.asarray(t_p, jnp.float32),
                    X=jnp.asarray(X_p, jnp.float32))
    prob = BAProblem(jnp.asarray(obs, jnp.float32), jnp.asarray(mask),
                     FX, FY, CX, CY)
    s, info = bundle_adjust(state, prob, iters=8)
    return np.asarray(s.R), np.asarray(s.t), float(info["final_cost"])


def _single_process_batch_reference():
    """The worker's phase-2 batch (8 sequences) run single-process on the
    test's own 8-device virtual mesh."""
    import jax
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import (
        SyntheticConfig, make_synthetic_sequence, synthetic_calib,
    )
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs
    from vislam_tpu.parallel import make_mesh
    from vislam_tpu.parallel.batch_runner import run_batch_sharded

    calib = synthetic_calib(160, 120)
    seqs = [make_synthetic_sequence(
        SyntheticConfig(n_frames=3, n_landmarks=80, seed=s), calib)
        for s in range(8)]
    eng = VIOEngine(seqs[0]["calib"])
    states = jax.tree.map(
        lambda *xs: jnp.stack([np.asarray(x) for x in xs]),
        *[eng.initialize(q["images"][0], q_wb0=q["gt_quat"][0]) for q in seqs],
    )
    inps = [make_sequence_inputs(q) for q in seqs]
    inputs = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs])
        if np.asarray(xs[0]).ndim > 0 else np.asarray(xs[0]), *inps)
    kf0 = np.stack([np.asarray(q["gt_pos"][0], np.float32) for q in seqs])
    mesh = make_mesh(8, axis_names=("seq",))
    _, res = run_batch_sharded(eng, states, inputs, kf0, mesh, axis="seq")
    return np.asarray(res.p_wc)  # (8, 2, 3)


def test_two_process_dist_ba_matches_single(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"out{i}.json" for i in range(2)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    env["PYTHONPATH"] = "/root/repo"
    procs = [
        subprocess.Popen(
            [sys.executable, "tests/_dist_worker.py", str(i), "2",
             str(port), str(outs[i])],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-process workers timed out")
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.load(open(o)) for o in outs]
    assert all(r["n_devices"] == 8 for r in results)
    # Both processes computed the identical replicated result.
    assert results[0]["final_cost"] == pytest.approx(
        results[1]["final_cost"], rel=1e-6)
    np.testing.assert_allclose(results[0]["R"], results[1]["R"], atol=1e-6)

    # And it matches the single-process solver on the same problem.
    R_ref, t_ref, cost_ref = _single_process_reference()
    assert results[0]["final_cost"] == pytest.approx(cost_ref, rel=1e-3)
    np.testing.assert_allclose(np.array(results[0]["R"]), R_ref, atol=1e-4)
    np.testing.assert_allclose(np.array(results[0]["t"]), t_ref, atol=1e-3)
    assert results[0]["final_cost"] < results[0]["initial_cost"]

    # Phase 2: multi-host batch VIO with per-process dataset staging —
    # the union of both hosts' local result shards must cover the global
    # batch and match a single-process run of the same 8 sequences.
    spans = sorted(tuple(r["batch_span"]) for r in results)
    assert spans == [(0, 4), (4, 8)]
    rows = {}
    for r in results:
        rows.update({int(k): np.array(v) for k, v in r["batch_rows"].items()})
    assert sorted(rows) == list(range(8))
    ref = _single_process_batch_reference()
    for b in range(8):
        np.testing.assert_allclose(rows[b], ref[b], atol=1e-4,
                                   err_msg=f"sequence {b}")


def test_process_shard_range():
    from vislam_tpu.parallel.mesh import process_shard_range

    # 10 items over 4 processes: 3,3,2,2 contiguous.
    spans = [process_shard_range(10, p, 4) for p in range(4)]
    assert spans == [(0, 3), (3, 6), (6, 8), (8, 10)]
    assert all(hi >= lo for lo, hi in spans)
