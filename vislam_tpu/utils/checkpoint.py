"""Engine-state checkpointing keyed by frame index.

The reference has no checkpoint/resume at all (SURVEY.md §5) — its closest
analog is the `start_index` config field. Here the whole EngineState pytree
(pose, keyframe window, feature buffers, biases) serializes to one .npz;
combined with the deterministic dataset index this gives exact resume.

Round-4 versioning (advisor finding): leaves are stored positionally AND
keyed by their pytree field path, so a checkpoint saved before EngineState
grew a field (e.g. vi_aligned in round 3) still loads — absent fields fill
from `_ADDED_FIELD_DEFAULTS` instead of failing unflatten with a leaf-count
mismatch.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from vislam_tpu.engine.state import EngineState, KeyframeWindow
from vislam_tpu.frontend.features import Features

# Defaults for fields added to the state after checkpoints may already
# exist in the wild, keyed by the LAST path component (the field name).
# Values are either arrays or callables taking K (the keypoint capacity,
# recovered from the stored kf_feat.uv leaf) for shaped defaults.
_ADDED_FIELD_DEFAULTS = {
    "vi_aligned": np.asarray(False),
    "kf_depths": lambda K, W: np.zeros((K,), np.float32),
    "kf_depth_valid": lambda K, W: np.zeros((K,), bool),
    "shadow_win_p": lambda K, W: np.zeros((W, 3), np.float32),
    "shadow_p_wc": lambda K, W: np.zeros((3,), np.float32),
    "shadow_kf_p_wc": lambda K, W: np.zeros((3,), np.float32),
    "shadow_scale": lambda K, W: np.asarray(0.0, np.float32),
    # Round 5: origin anchors for the bootstrap's position re-base. A
    # legacy checkpoint predates them; zeros match the synthetic/default
    # start and a latched (warm) state never uses them again.
    "origin_p_wc": lambda K, W: np.zeros((3,), np.float32),
    "shadow_origin_p": lambda K, W: np.zeros((3,), np.float32),
    "bootstrap_applies": lambda K, W: np.asarray(0, np.int32),
    # Round 5 (late): two-phase engagement latch. False = a resumed legacy
    # GT-free run re-derives engagement at its next promotions, exactly as
    # a fresh run would.
    "vi_engaged": np.asarray(False),
}


def _leaf_paths(template):
    """Flattened (path-string, leaf) pairs in tree order."""
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    return [(jax.tree_util.keystr(path), leaf) for path, leaf in flat]


def save_checkpoint(path: str, state: EngineState, frame_index: int,
                    meta: dict | None = None) -> None:
    import ml_dtypes

    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    arrays = {}
    paths = []
    bf16 = []
    for i, (kpath, leaf) in enumerate(flat):
        arr = np.asarray(leaf)
        # npz cannot represent bfloat16 (round 5: the window descriptor
        # bank); store as f32 (lossless widening) and record the leaf so
        # load restores the dtype.
        if arr.dtype == ml_dtypes.bfloat16:
            bf16.append(i)
            arr = arr.astype(np.float32)
        arrays[f"leaf_{i}"] = arr
        paths.append(jax.tree_util.keystr(kpath))
    arrays["__frame_index"] = np.asarray(frame_index)
    arrays["__paths"] = np.asarray(paths)
    arrays["__bf16_leaves"] = np.asarray(bf16, np.int64)
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
    """Returns (state: EngineState, frame_index: int).

    Loading order: (a) path-keyed match against the current structure
    (robust to added/reordered fields); (b) legacy positional when counts
    match; (c) legacy positional padded with `_ADDED_FIELD_DEFAULTS` for
    trailing fields added since the save.
    """
    import ml_dtypes

    data = np.load(path)
    n = sum(1 for k in data.files if k.startswith("leaf_"))
    stored = [data[f"leaf_{i}"] for i in range(n)]
    if "__bf16_leaves" in data.files:
        for i in data["__bf16_leaves"]:
            stored[int(i)] = stored[int(i)].astype(ml_dtypes.bfloat16)
    frame_index = int(data["__frame_index"])

    template = _template_from_leaves(stored)
    cur_paths = [p for p, _ in _leaf_paths(template)]

    def _capacity(leaves_by_path):
        K = W = 0
        for p, leaf in leaves_by_path:
            if p.endswith("uv") and "kf_feat" in p and leaf.ndim == 2:
                K = int(leaf.shape[0])
            if p.endswith("uv") and "window" in p and leaf.ndim == 3:
                W = int(leaf.shape[0])
        return K, W

    if "__paths" in data.files:
        by_path = {str(p): leaf
                   for p, leaf in zip(list(data["__paths"]), stored)}
        K_cap, W_cap = _capacity(list(by_path.items()))
        leaves = []
        for p in cur_paths:
            if p in by_path:
                leaves.append(by_path[p])
            else:
                leaves.append(_default_for(p, K_cap, W_cap))
    elif n == len(cur_paths):
        leaves = stored
    else:
        # Pre-versioning checkpoint with fewer leaves: fields were appended
        # over time, so pad the MISSING TRAILING positions from defaults.
        if n > len(cur_paths):
            raise ValueError(
                f"checkpoint has {n} leaves but the current EngineState has "
                f"{len(cur_paths)} — cannot migrate a newer checkpoint")
        K_cap, W_cap = _capacity(list(zip(cur_paths[:n], stored)))
        leaves = list(stored)
        for p in cur_paths[n:]:
            leaves.append(_default_for(p, K_cap, W_cap))

    state = jax.tree.unflatten(jax.tree.structure(template), leaves)
    return state, frame_index


def _default_for(path: str, K_cap: int = 0, W_cap: int = 0):
    name = path.split(".")[-1].strip("']")
    if name in _ADDED_FIELD_DEFAULTS:
        d = _ADDED_FIELD_DEFAULTS[name]
        return d(K_cap, W_cap) if callable(d) else d
    raise ValueError(
        f"checkpoint is missing state field {path!r} and no migration "
        f"default is registered for it")


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
