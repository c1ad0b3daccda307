"""Keyframe-map persistence: save/load the archive the loop-closure and
relocalization pipelines consume.

Map reuse is the missing half of relocalization: a saved archive from one
run localizes a later session in the same place (backend/reloc.py) with no
bootstrapping. The reference has no map concept at all — its keyframe ring
buffer dies with the process (/root/reference/src/VISystem.cpp:408-412).

Format: one compressed .npz of stacked per-keyframe arrays (+ a schema
version); host-side numpy only.
"""

from __future__ import annotations

from typing import List

import numpy as np

from vislam_tpu.backend.trajectory_opt import KeyframeRecord

_VERSION = 1


def save_map(path: str, keyframes: List[KeyframeRecord]) -> None:
    """Write the keyframe archive to `path` (.npz, compressed)."""
    if not keyframes:
        raise ValueError("empty keyframe archive")
    np.savez_compressed(
        path,
        version=np.int64(_VERSION),
        frame_index=np.asarray([k.frame_index for k in keyframes], np.int64),
        R_wc=np.stack([k.R_wc for k in keyframes]).astype(np.float32),
        p_wc=np.stack([k.p_wc for k in keyframes]).astype(np.float32),
        uv=np.stack([k.uv for k in keyframes]).astype(np.float32),
        desc=np.stack([k.desc for k in keyframes]).astype(np.float32),
        kp_mask=np.stack([k.kp_mask for k in keyframes]).astype(bool),
    )


def load_map(path: str) -> List[KeyframeRecord]:
    """Load a keyframe archive written by save_map."""
    with np.load(path) as z:
        v = int(z["version"])
        if v != _VERSION:
            raise ValueError(f"map schema version {v} != {_VERSION}")
        n = len(z["frame_index"])
        return [
            KeyframeRecord(
                frame_index=int(z["frame_index"][i]),
                R_wc=z["R_wc"][i], p_wc=z["p_wc"][i],
                uv=z["uv"][i], desc=z["desc"][i], kp_mask=z["kp_mask"][i],
            )
            for i in range(n)
        ]
