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

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vislam_tpu.engine.batch import SequenceInputs, _scan_fn
from vislam_tpu.engine.engine import VIOEngine


def run_batch_sharded(eng: VIOEngine, states0, inputs_batch: SequenceInputs,
                      kf_gt_pos0, mesh: Mesh, axis: str = "seq",
                      seed: int = 0):
    """Like engine.batch.run_batch_scan but with the batch dim sharded on
    `axis` of `mesh`. B must be divisible by the axis size.

    Returns (final_states (B,...), FrameResults (B, N, ...)) with outputs
    sharded the same way.
    """
    step_fn = eng._build_step()
    B = inputs_batch.images.shape[0]
    n_dev = mesh.shape[axis]
    if B % n_dev:
        raise ValueError(f"batch {B} not divisible by mesh axis {n_dev}")

    keys = jax.random.split(jax.random.PRNGKey(seed), B)

    def one(state0, kf0, images, imu, imu_dt, gt_pos, key):
        inp = SequenceInputs(images=images, imu=imu, imu_dt=imu_dt,
                             gt_pos=gt_pos,
                             use_gt_scale=inputs_batch.use_gt_scale)
        return _scan_fn(step_fn, state0, kf0, inp, key)

    batched = jax.vmap(one)

    shard = NamedSharding(mesh, P(axis))
    place = lambda tree: jax.tree.map(lambda x: jax.device_put(x, shard), tree)
    states0 = place(states0)
    kf_gt_pos0 = place(kf_gt_pos0)
    images = place(inputs_batch.images)
    imu = place(inputs_batch.imu)
    imu_dt = place(inputs_batch.imu_dt)
    gt_pos = place(inputs_batch.gt_pos)
    keys = place(keys)

    fn = jax.jit(batched)
    return fn(states0, kf_gt_pos0, images, imu, imu_dt, gt_pos, keys)
