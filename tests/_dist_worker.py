"""Multi-process dist-BA worker (spawned by test_multiprocess.py).

Each of the N processes hosts 4 virtual CPU devices, joins the jax.distributed
cluster via parallel.mesh.distributed_init, builds the IDENTICAL seeded BA
problem from host numpy, and runs the landmark-sharded BA over the global
("host", "map") mesh — the psum Schur reduction spans the process (DCN)
boundary. Writes final cost + refined poses as JSON for the parent test.

Usage: python tests/_dist_worker.py <pid> <nproc> <port> <out.json>
"""

import json
import sys


def main():
    pid, nproc, port, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from vislam_tpu.parallel.mesh import distributed_init, make_global_mesh

    my_pid = distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
        local_device_count=4,
        platform="cpu",
    )
    assert my_pid == pid
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    import numpy as np

    from tests.test_backend import _make_window, FX, FY, CX, CY
    from vislam_tpu.backend import BAProblem, BAState
    from vislam_tpu.parallel import dist_bundle_adjust, shard_problem

    rng = np.random.default_rng(1234)  # identical problem on every process
    from scipy.spatial.transform import Rotation as Rsp

    X, R_cw, t_cw, obs, mask = _make_window(rng, W=5, L=96, noise_px=0.3)
    R_p, t_p = R_cw.copy(), t_cw.copy()
    for k in range(1, len(R_cw)):
        R_p[k] = Rsp.from_rotvec(rng.normal(scale=0.008, size=3)).as_matrix() @ R_cw[k]
        t_p[k] = t_cw[k] + rng.normal(scale=0.04, size=3)
    X_p = X + rng.normal(scale=0.15, size=X.shape)

    state = BAState(R=R_p.astype(np.float32), t=t_p.astype(np.float32),
                    X=X_p.astype(np.float32))
    prob = BAProblem(obs_uv=obs.astype(np.float32), obs_mask=mask,
                     fx=FX, fy=FY, cx=CX, cy=CY)

    mesh = make_global_mesh(("host", "map"))
    st_sh, pr_sh = shard_problem(state, prob, mesh, axis=("host", "map"))
    s_dist, info = dist_bundle_adjust(
        st_sh, pr_sh, mesh, axis=("host", "map"), iters=8)

    # --- Phase 2: multi-host batch VIO with per-process dataset staging.
    # Each process stages only ITS sequence range (process_shard_range);
    # the global batch is assembled from process-local shards.
    import jax.numpy as jnp

    from vislam_tpu.data.synthetic import SyntheticConfig, make_synthetic_sequence
    from vislam_tpu.data.synthetic import synthetic_calib
    from vislam_tpu.engine import VIOEngine, make_sequence_inputs
    from vislam_tpu.parallel.batch_runner import run_batch_sharded
    from vislam_tpu.parallel.mesh import process_shard_range

    B_global, n_frames = 8, 3
    calib = synthetic_calib(160, 120)
    lo, hi = process_shard_range(B_global)
    seqs = [make_synthetic_sequence(
        SyntheticConfig(n_frames=n_frames, n_landmarks=80, seed=s), calib)
        for s in range(lo, hi)]
    eng = VIOEngine(seqs[0]["calib"])
    states = jax.tree.map(
        lambda *xs: jnp.stack([np.asarray(x) for x in xs]),
        *[eng.initialize(q["images"][0], q_wb0=q["gt_quat"][0]) for q in seqs],
    )
    # Host numpy trees for process-local staging.
    states = jax.tree.map(lambda x: np.asarray(x), states)
    inps = [make_sequence_inputs(q) for q in seqs]
    inputs = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs])
        if np.asarray(xs[0]).ndim > 0 else np.asarray(xs[0]), *inps)
    kf0 = np.stack([np.asarray(q["gt_pos"][0], np.float32) for q in seqs])
    mesh_seq = make_global_mesh(("seq",))
    fstates, res = run_batch_sharded(
        eng, states, inputs, kf0, mesh_seq, axis="seq", process_local=True)
    jax.block_until_ready(res.p_wc)
    # Read back only the addressable (this host's) shard rows.
    local_rows = {}
    for sh in res.p_wc.addressable_shards:
        b0 = sh.index[0].start or 0
        arr = np.asarray(sh.data)
        for k in range(arr.shape[0]):
            local_rows[str(b0 + k)] = arr[k].tolist()

    with open(out_path, "w") as f:
        json.dump({
            "process_id": pid,
            "n_devices": len(jax.devices()),
            "initial_cost": float(info["initial_cost"]),
            "final_cost": float(info["final_cost"]),
            "R": np.asarray(s_dist.R).tolist(),
            "t": np.asarray(s_dist.t).tolist(),
            "batch_rows": local_rows,
            "batch_span": [lo, hi],
        }, f)
    print(f"[worker {pid}] final_cost={float(info['final_cost']):.6f} "
          f"batch rows {sorted(local_rows)}", flush=True)


if __name__ == "__main__":
    main()
