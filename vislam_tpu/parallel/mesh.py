"""Device-mesh helpers.

The reference has no distributed backend at all (SURVEY.md §2: no NCCL/MPI;
its only inter-process transport is ROS pub/sub). This module is the
replacement: jax.sharding meshes over TPU pod slices, with XLA collectives
doing the communication over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("map",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """1-D (default) or N-D mesh over the first n_devices devices.

    The default single 'map' axis shards landmarks/map-blocks (the BA's
    natural parallel dimension). Multi-axis meshes (e.g. ('seq', 'map'))
    combine sequence-parallel batch processing with sharded BA.
    """
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        # Default backend too small (e.g. the one real TPU chip): fall back
        # to the host CPU backend, which honors
        # xla_force_host_platform_device_count for virtual n-device meshes.
        devs = jax.devices("cpu")
    devs = devs[:n]
    if len(devs) < n:
        raise ValueError(
            f"requested {n}-device mesh but only {len(devs)} devices exist"
        )
    if shape is None:
        shape = (n,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    arr = np.array(devs).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))
