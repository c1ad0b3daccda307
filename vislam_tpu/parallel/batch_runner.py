"""Mesh-sharded multi-sequence batch processing.

BASELINE.json config #5: many sequences processed concurrently with the batch
dimension sharded across devices (data parallelism over sequences — each
device runs the full VIO scan for its sequences; no cross-device
communication inside the step, so scaling is embarrassingly parallel and
efficiency is bounded only by load balance).

Combine with the landmark-sharded distributed BA (dist_ba.py) on a 2-D
('seq', 'map') mesh for the full production layout.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vislam_tpu.engine.batch import SequenceInputs, _scan_fn
from vislam_tpu.engine.engine import VIOEngine


def _axis_size(mesh: Mesh, axis) -> int:
    if isinstance(axis, (tuple, list)):
        n = 1
        for a in axis:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axis]


def run_batch_sharded(eng: VIOEngine, states0, inputs_batch: SequenceInputs,
                      kf_gt_pos0, mesh: Mesh, axis: str = "seq",
                      seed: int = 0, process_local: bool = False):
    """Like engine.batch.run_batch_scan but with the batch dim sharded on
    `axis` of `mesh`. B must be divisible by the axis size.

    process_local=True is the MULTI-HOST staging mode (SURVEY §5 'host-side
    dataset sharding by sequence range'): each process passes only ITS OWN
    sequences (shaped (B_local, ...), B_local = B_global / process_count —
    pick them with parallel.mesh.process_shard_range) and the global batch
    is assembled from the per-process shards without any cross-host data
    movement. Global-shape scalars (use_gt_scale) stay host-replicated.

    Returns (final_states (B,...), FrameResults (B, N, ...)) with outputs
    sharded the same way; under multi-process each host can read back its
    addressable shards.
    """
    step_fn = eng._build_step()
    n_dev = _axis_size(mesh, axis)

    shard = NamedSharding(mesh, P(axis))
    if process_local:
        n_proc = jax.process_count()
        B_local = inputs_batch.images.shape[0]
        B = B_local * n_proc

        def place_one(x):
            import numpy as np

            return jax.make_array_from_process_local_data(shard, np.asarray(x))
    else:
        B = inputs_batch.images.shape[0]

        def place_one(x):
            return jax.device_put(x, shard)

    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by mesh axis {n_dev}")

    # Keys are derived from the GLOBAL sequence index so multi-host runs are
    # bit-identical to single-host runs of the same global batch.
    if process_local:
        import numpy as np

        lo = jax.process_index() * inputs_batch.images.shape[0]
        keys = np.asarray(jax.random.split(jax.random.PRNGKey(seed), B))[
            lo:lo + inputs_batch.images.shape[0]]
    else:
        keys = jax.random.split(jax.random.PRNGKey(seed), B)

    # Python bool (HLO literal), never a captured device scalar: a closed-
    # over single-device array is re-uploaded per dispatch (CLAUDE.md rule 1)
    # and is outright invalid alongside global arrays under multi-process.
    import numpy as _np

    use_gt = bool(_np.asarray(inputs_batch.use_gt_scale))

    def one(state0, kf0, images, imu, imu_dt, gt_pos, key):
        inp = SequenceInputs(images=images, imu=imu, imu_dt=imu_dt,
                             gt_pos=gt_pos, use_gt_scale=use_gt)
        return _scan_fn(step_fn, state0, kf0, inp, key)

    batched = jax.vmap(one)

    place = lambda tree: jax.tree.map(place_one, tree)
    states0 = place(states0)
    kf_gt_pos0 = place(kf_gt_pos0)
    images = place(inputs_batch.images)
    imu = place(inputs_batch.imu)
    imu_dt = place(inputs_batch.imu_dt)
    gt_pos = place(inputs_batch.gt_pos)
    keys = place(keys)

    fn = jax.jit(batched)
    return fn(states0, kf_gt_pos0, images, imu, imu_dt, gt_pos, keys)
