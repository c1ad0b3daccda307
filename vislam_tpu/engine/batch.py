"""Offline sequence processing: the whole frame loop as one on-device scan.

The reference's main loop round-trips host<->device every frame
(/root/reference/src/main_vi_slam.cpp:114-355). Online streaming needs that,
but offline (dataset evaluation, the usual SLAM benchmark mode) does not —
so this module stages the whole sequence (or a chunk) in device memory and
runs the engine step under lax.scan: one XLA program, zero per-frame dispatch
overhead, and the natural building block for batching many sequences at once
(vmap) and sharding them across a mesh (vislam_tpu/parallel/batch_runner.py).

GT-scale bookkeeping (distance since last keyframe) moves into the scan
carry, so scan mode reproduces streaming-mode semantics exactly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vislam_tpu.engine.engine import VIOEngine, FrameResult
from vislam_tpu.engine.state import EngineState


class SequenceInputs(NamedTuple):
    """Per-frame inputs staged on device; leading dim N = frames."""

    images: jnp.ndarray    # (N, H, W) float32
    imu: jnp.ndarray       # (N, S, 6)
    imu_dt: jnp.ndarray    # (N, S)
    gt_pos: jnp.ndarray    # (N, 3)  (zeros if unused)
    use_gt_scale: jnp.ndarray  # () bool


def make_sequence_inputs(seq: dict, start: int = 1, end: Optional[int] = None,
                         imu_window: int = 16, use_gt_scale: bool = True,
                         imu_rate: float = 200.0, cam_rate: float = 20.0
                         ) -> SequenceInputs:
    """Stage a synthetic-generator dict (vislam_tpu.data.synthetic) as inputs."""
    import numpy as np

    end = len(seq["images"]) if end is None else end
    spf = int(round(imu_rate / cam_rate))
    N = end - start
    imu = np.zeros((N, imu_window, 6), np.float32)
    dt = np.zeros((N, imu_window), np.float32)
    for n, j in enumerate(range(start, end)):
        lo, hi = (j - 1) * spf, j * spf
        imu[n, :spf] = np.concatenate(
            [seq["imu_gyro"][lo:hi], seq["imu_accel"][lo:hi]], -1
        )
        dt[n, :spf] = 1.0 / imu_rate
    return SequenceInputs(
        images=jnp.asarray(seq["images"][start:end], jnp.float32),
        imu=jnp.asarray(imu),
        imu_dt=jnp.asarray(dt),
        gt_pos=jnp.asarray(seq["gt_pos"][start:end], jnp.float32),
        use_gt_scale=jnp.asarray(use_gt_scale),
    )


def stage_dataset(dataset, start: int, end: int, imu_window: int = 16,
                  use_gt_scale: bool = True, undistort=None) -> SequenceInputs:
    """Stage a dataset reader's frames [start, end) as device-ready inputs.

    Works with any reader exposing frame_window(j) (EUROC/KITTI/TUM). Frames
    are decoded host-side once; the whole chunk then runs as one on-device
    scan (the 17k fps/chip offline path) instead of per-frame dispatch.
    """
    import numpy as np

    images, imu, imu_dt, gt_pos = [], [], [], []
    have_gt = True
    for j in range(start, end):
        fw = dataset.frame_window(j)
        img = fw.image
        if undistort is not None:
            img = np.asarray(undistort(img))
        images.append(np.asarray(img, np.float32))
        imu.append(fw.imu)
        imu_dt.append(fw.imu_dt)
        if fw.gt_pos is None:
            have_gt = False
            gt_pos.append(np.zeros(3, np.float32))
        else:
            gt_pos.append(np.asarray(fw.gt_pos, np.float32))
    return SequenceInputs(
        images=jnp.asarray(np.stack(images)),
        imu=jnp.asarray(np.stack(imu)),
        imu_dt=jnp.asarray(np.stack(imu_dt)),
        gt_pos=jnp.asarray(np.stack(gt_pos)),
        use_gt_scale=jnp.asarray(use_gt_scale and have_gt),
    )


def _scan_fn(step_fn, state0: EngineState, kf_gt_pos0, inputs: SequenceInputs,
             base_key):
    def body(carry, inp):
        state, kf_gt_pos = carry
        img, imu, dt, gt_p, idx = inp
        key = jax.random.fold_in(base_key, idx)
        gt_norm = jnp.where(
            inputs.use_gt_scale,
            jnp.linalg.norm(gt_p - kf_gt_pos),
            -1.0,
        )
        state, res = step_fn(state, img, imu, dt, gt_norm, key)
        kf_gt_pos = jnp.where(res.is_keyframe, gt_p, kf_gt_pos)
        return (state, kf_gt_pos), res

    n = inputs.images.shape[0]
    idxs = jnp.arange(n)
    (state, _), results = jax.lax.scan(
        body, (state0, kf_gt_pos0),
        (inputs.images, inputs.imu, inputs.imu_dt, inputs.gt_pos, idxs),
    )
    return state, results


def run_sequence_scan(eng: VIOEngine, state0: EngineState,
                      inputs: SequenceInputs, kf_gt_pos0=None, seed: int = 0):
    """Process a whole sequence in one jitted scan.

    Returns (final_state, FrameResult with leading dim N). The jitted scan is
    cached on the engine — rebuilding it per call would retrace every time.
    """
    if kf_gt_pos0 is None:
        kf_gt_pos0 = inputs.gt_pos[0] * 0.0 + jnp.asarray(state0.p_wc)
    fn = getattr(eng, "_scan_jit", None)
    if fn is None:
        fn = jax.jit(partial(_scan_fn, eng._build_step()))
        eng._scan_jit = fn
    return fn(state0, jnp.asarray(kf_gt_pos0, jnp.float32), inputs,
              jax.random.PRNGKey(seed))


def run_batch_scan(eng: VIOEngine, states0, inputs_batch: SequenceInputs,
                   kf_gt_pos0, seed: int = 0):
    """vmap over a leading batch dim: (B, N, ...) inputs, batched state.

    The multi-sequence throughput mode (BASELINE.json config #5 on one chip);
    the mesh-sharded version lives in vislam_tpu.parallel.batch_runner.
    """
    step_fn = eng._build_step()

    def one(state0, kf0, images, imu, imu_dt, gt_pos, use_gt, key):
        inp = SequenceInputs(images=images, imu=imu, imu_dt=imu_dt,
                             gt_pos=gt_pos, use_gt_scale=use_gt)
        return _scan_fn(step_fn, state0, kf0, inp, key)

    B = inputs_batch.images.shape[0]
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    fn = getattr(eng, "_batch_scan_jit", None)
    if fn is None:
        fn = jax.jit(jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None, 0)))
        eng._batch_scan_jit = fn
    return fn(states0, kf_gt_pos0, inputs_batch.images, inputs_batch.imu,
              inputs_batch.imu_dt, inputs_batch.gt_pos,
              inputs_batch.use_gt_scale, keys)
