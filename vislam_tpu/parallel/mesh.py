"""Device-mesh helpers + multi-process (multi-host) initialization.

The reference has no distributed backend at all (SURVEY.md §2: no NCCL/MPI;
its only inter-process transport is ROS pub/sub). This module is the
replacement: jax.distributed process bootstrap (SURVEY §5: "jax.distributed
initialization + a Mesh over pod-slice devices") plus jax.sharding meshes,
with XLA collectives doing the communication over ICI (intra-slice) and DCN
(the cross-host 'host' mesh axis).

Multi-host layout convention: jax.devices() orders devices by process index,
so reshaping the global device list to (num_processes, local_count) puts the
process boundary on the leading 'host' axis — collectives along 'host' ride
DCN, collectives along trailing axes ride ICI. The landmark-sharded BA
(dist_ba.py) is mesh-shape-agnostic: its psum reduces over whichever axis the
landmarks are sharded on, so the same program runs single-chip, one host, or
a multi-host ('host', 'map') mesh unchanged.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_count: Optional[int] = None,
    platform: Optional[str] = None,
) -> int:
    """Initialize multi-process JAX (idempotent). Returns this process' id.

    On TPU pods with standard env (TPU_WORKER_HOSTNAMES etc.) all arguments
    auto-detect and plain distributed_init() suffices; for explicit
    coordination (or CPU multi-process testing) pass coordinator_address
    ("host:port"), num_processes, and process_id. local_device_count forces
    N virtual CPU devices per process (CPU testing; must be set before any
    JAX op runs).

    Env fallbacks: VISLAM_COORDINATOR / VISLAM_NUM_PROCESSES /
    VISLAM_PROCESS_ID, so launchers can configure workers without code.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "VISLAM_COORDINATOR")
    if num_processes is None and "VISLAM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VISLAM_NUM_PROCESSES"])
    if process_id is None and "VISLAM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VISLAM_PROCESS_ID"])
    if platform:
        jax.config.update("jax_platforms", platform)
    if local_device_count:
        jax.config.update("jax_num_cpu_devices", int(local_device_count))
    # NOTE: no jax.* query may run before initialize() (it would initialize
    # the XLA backend single-process); idempotence is handled by catching
    # the double-initialize error instead.
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        else:
            jax.distributed.initialize()  # full auto-detection (TPU pod env)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    return jax.process_index()


def make_global_mesh(
    axis_names: Sequence[str] = ("host", "map"),
    local_axis_shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Mesh over ALL processes' devices: leading 'host' axis = process
    boundary (DCN), trailing axes over each process' local devices (ICI).

    local_axis_shape reshapes the per-process device count over the trailing
    axes (default: one trailing axis of all local devices).
    """
    n_proc = jax.process_count()
    devs = jax.devices()  # globally ordered by process index
    local = len(devs) // n_proc
    if len(axis_names) == 1:
        # Flat global mesh: one axis over every device of every process
        # (still process-contiguous, so shards stay host-local by range).
        return Mesh(np.array(devs), (axis_names[0],))
    if local_axis_shape is None:
        local_axis_shape = (local,) if len(axis_names) == 2 else None
    if local_axis_shape is None or int(np.prod(local_axis_shape)) != local:
        raise ValueError(
            f"local_axis_shape {local_axis_shape} must cover the {local} "
            f"local devices ({len(axis_names) - 1} trailing axes)"
        )
    arr = np.array(devs).reshape((n_proc, *local_axis_shape))
    return Mesh(arr, tuple(axis_names))


def process_shard_range(n_items: int, process_id: Optional[int] = None,
                        process_count: Optional[int] = None):
    """Host-side dataset sharding: this process' contiguous [lo, hi) slice of
    n_items sequences/keyframes (SURVEY §5 'host-side dataset sharding by
    sequence/keyframe range'). Remainder items go to the leading processes."""
    p = jax.process_index() if process_id is None else process_id
    c = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n_items, c)
    lo = p * base + min(p, rem)
    return lo, lo + base + (1 if p < rem else 0)


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
