"""Engine-state checkpointing keyed by frame index.

The reference has no checkpoint/resume at all (SURVEY.md §5) — its closest
analog is the `start_index` config field. Here the whole EngineState pytree
(pose, keyframe window, feature buffers, biases) serializes to one .npz;
combined with the deterministic dataset index this gives exact resume.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from vislam_tpu.engine.state import EngineState, KeyframeWindow
from vislam_tpu.frontend.features import Features


def save_checkpoint(path: str, state: EngineState, frame_index: int,
                    meta: dict | None = None) -> None:
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrays["__frame_index"] = np.asarray(frame_index)
    np.savez_compressed(path, **arrays)
    if meta:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint(path: str):
    """Returns (state: EngineState, frame_index: int)."""
    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    frame_index = int(data["__frame_index"])
    # Rebuild the pytree structure from a template with matching shapes.
    template = _template_from_leaves(leaves)
    state = jax.tree.unflatten(jax.tree.structure(template), leaves)
    return state, frame_index


def _template_from_leaves(leaves):
    """EngineState structure template (shapes come from the stored leaves)."""
    import jax.numpy as jnp

    z = [jnp.zeros(1)] * len(leaves)
    # Build a structurally-identical EngineState; leaf values are irrelevant.
    feat = Features(uv=z[0], desc=z[0], score=z[0], level=z[0], angle=z[0], mask=z[0])
    win = KeyframeWindow(uv=z[0], desc=z[0], kp_mask=z[0], R_cw=z[0], t_cw=z[0],
                         valid=z[0], count=z[0])
    return EngineState(
        q_wb=z[0], v_w=z[0], bias_g=z[0], bias_a=z[0], R_wc=z[0], p_wc=z[0],
        kf_R_wc=z[0], kf_p_wc=z[0], kf_feat=feat, kf_image=z[0], window=win,
        frame_idx=z[0], kf_count=z[0], kf_time=z[0], kf_dp_imu=z[0],
    )
