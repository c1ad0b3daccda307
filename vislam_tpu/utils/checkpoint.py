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
    # Uncompressed: the state is a few MB and per-keyframe saves sit on the
    # streaming path (compression measured 191 ms/save vs ~10 ms raw).
    np.savez(path, **arrays)
    if meta:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_checkpoint_meta(path: str) -> dict:
    """Sidecar metadata written by save_checkpoint (empty dict if absent)."""
    meta_path = path + ".meta.json"
    if not os.path.exists(meta_path):
        return {}
    with open(meta_path) as f:
        return json.load(f)


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
    """EngineState structure template (shapes come from the stored leaves).

    Built programmatically from each NamedTuple's _fields so the template
    can never fall out of sync when EngineState/KeyframeWindow grow fields.
    """
    import jax.numpy as jnp

    z = jnp.zeros(1)

    def fill(cls, nested=None):
        nested = nested or {}
        return cls(**{f: nested.get(f, z) for f in cls._fields})

    return fill(EngineState, {
        "kf_feat": fill(Features),
        "window": fill(KeyframeWindow),
    })
