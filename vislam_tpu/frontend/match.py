"""Batched descriptor matching: one MXU distance matrix + masked top-2.

Role of the reference Matcher (/root/reference/src/Matcher.cpp): bidirectional
2-NN brute force (:83-94), Lowe ratio 0.8 (nnFilter, :148-169), symmetry /
cross-check (computeSymMatches, :96-144), and the best-per-grid-cell spatial
dedup (bestMatchesFilter, :171-244). The CUDA variant (MatcherGPU.cpp:44-66)
does the same knnMatch on device. Here the whole chain is a single fused
fixed-shape computation: D = ||a||^2 + ||b||^2 - 2 a.b on the MXU, two-pass
masked min for top-2 in both directions, boolean masks for ratio + mutual
checks, and a segment-min for per-cell dedup. No dynamic shapes anywhere.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e9


class Matches(NamedTuple):
    """Fixed-capacity match set from frame A to frame B.

    idx_b[k] = matched B-keypoint row for A-keypoint k (undefined when
    mask[k] is False); dist is the L2 descriptor distance.
    """

    idx_b: jnp.ndarray  # (K,) int32
    dist: jnp.ndarray   # (K,) float32
    mask: jnp.ndarray   # (K,) bool


def _top2_min(D):
    """Row-wise two smallest values + argmin. D: (M, N) -> (min1, min2, arg1).

    Scatter-free: masking the argmin column with a broadcast compare instead
    of an .at[] scatter (TPU scatters serialize and dominate the frame step).
    """
    min1 = jnp.min(D, axis=1)
    arg1 = jnp.argmin(D, axis=1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, D.shape, 1)
    D2 = jnp.where(col_ids == arg1[:, None].astype(jnp.int32), _BIG, D)
    min2 = jnp.min(D2, axis=1)
    return min1, min2, arg1


def match_descriptors(
    desc_a,
    mask_a,
    desc_b,
    mask_b,
    uv_a=None,
    ratio: float = 0.8,
    mutual: bool = True,
    cell_rows: int = 0,
    cell_cols: int = 0,
    image_size=None,
    use_pallas: bool = False,
    uv_pred=None,
    uv_b=None,
    gate_radius: float = 0.0,
) -> Matches:
    """Match descriptors A->B with ratio, mutual, and optional grid dedup.

    desc_*: (K, D) L2-normalized descriptors; mask_*: (K,) validity.
    If cell_rows/cols > 0 and uv_a/image_size are given, keep only the
    best (smallest-distance) match per spatial grid cell of image A —
    the reference's bestMatchesFilter semantics with static shapes.

    Guided matching: when uv_pred (K,2 predicted position of each A keypoint
    in image B — e.g. the IMU-rotation warp), uv_b (K,2 B keypoint positions)
    and gate_radius > 0 are given, candidate pairs outside the prediction
    disc are excluded BEFORE the ratio test — suppressing mismatches in
    repetitive texture and tightening the ratio statistics.

    use_pallas swaps the distance/top-2/reverse-argmin core for the fused
    VMEM-resident kernel (ops/match_kernel.py), including the guided-gate
    variant; the filter chain (ratio/mutual/grid dedup) is shared.
    """
    K = desc_a.shape[0]
    gated = uv_pred is not None and uv_b is not None and gate_radius > 0.0
    if use_pallas:
        from vislam_tpu.ops.match_kernel import match_top2_pallas

        min1, min2, arg1, colarg = match_top2_pallas(
            desc_a, mask_a, desc_b, mask_b,
            **(dict(uv_pred=uv_pred, uv_b=uv_b,
                    gate_radius=float(gate_radius)) if gated else {}),
        )
        ok = mask_a & (min1 < _BIG * 0.5)
        ok &= min1 < (ratio * ratio) * jnp.maximum(min2, 1e-12)
        if mutual:
            safe_arg = jnp.clip(arg1, 0, K - 1)
            ok &= jnp.take(colarg, safe_arg) == jnp.arange(K)
    else:
        # Squared L2 distances via MXU matmul. Inputs may be bf16 (the
        # round-5 window descriptor bank); the cross term runs on the MXU
        # with f32 accumulation either way, and the squared norms reduce in
        # f32 (a 128-term bf16 accumulation would cost ~1% of the O(1)
        # norm — the converts fuse into the reductions, nothing f32-sized
        # materializes).
        a32 = desc_a.astype(jnp.float32)
        b32 = desc_b.astype(jnp.float32)
        sq_a = jnp.sum(a32 * a32, axis=-1, keepdims=True)            # (K,1)
        sq_b = jnp.sum(b32 * b32, axis=-1, keepdims=True).T          # (1,K)
        cross = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
        D = jnp.maximum(sq_a + sq_b - 2.0 * cross, 0.0)

        # Invalidate padded rows/cols.
        D = jnp.where(mask_a[:, None] & mask_b[None, :], D, _BIG)

        if gated:
            du = uv_pred[:, None, 0] - uv_b[None, :, 0]
            dv = uv_pred[:, None, 1] - uv_b[None, :, 1]
            D = jnp.where(
                du * du + dv * dv <= gate_radius * gate_radius, D, _BIG
            )

        min1, min2, arg1 = _top2_min(D)
        ok = mask_a & (min1 < _BIG * 0.5)
        # Lowe ratio on distances (squared dists -> ratio^2).
        ok &= min1 < (ratio * ratio) * jnp.maximum(min2, 1e-12)

        if mutual:
            # Symmetry check: B->A argmin must point back.
            argB = jnp.argmin(D, axis=0)  # (K,) best A row for each B col
            ok &= argB[arg1] == jnp.arange(D.shape[0])

    dist = jnp.sqrt(jnp.maximum(min1, 0.0))

    if cell_rows > 0 and cell_cols > 0 and uv_a is not None and image_size is not None:
        H, W = image_size
        cu = jnp.clip((uv_a[:, 0] / W * cell_cols).astype(jnp.int32), 0, cell_cols - 1)
        cv = jnp.clip((uv_a[:, 1] / H * cell_rows).astype(jnp.int32), 0, cell_rows - 1)
        cell = cv * cell_cols + cu
        n_cells = cell_rows * cell_cols
        keyed = jnp.where(ok, dist, _BIG)
        # Per-cell min WITHOUT scatter: TPU scatters serialize (measured 30+ms
        # for two 512-row scatter-mins inside the step); a (K, C) one-hot
        # masked min-reduction is fully vectorized and effectively free.
        onehot = cell[:, None] == jnp.arange(n_cells, dtype=jnp.int32)[None, :]
        cell_best = jnp.min(
            jnp.where(onehot, keyed[:, None], _BIG), axis=0
        )  # (C,)
        is_best = ok & (keyed <= jnp.take(cell_best, cell) + 1e-12)
        # Break exact ties by keypoint row order: first best in each cell wins.
        row = jnp.arange(keyed.shape[0], dtype=jnp.int32)
        row_keyed = jnp.where(is_best, row, jnp.int32(2 ** 30))
        first_best = jnp.min(
            jnp.where(onehot, row_keyed[:, None], jnp.int32(2 ** 30)), axis=0
        )
        ok = is_best & (row == jnp.take(first_best, cell))

    return Matches(idx_b=arg1.astype(jnp.int32), dist=dist, mask=ok)


def gather_matched(uv_a, uv_b, matches: Matches):
    """Convenience: matched coordinate pairs (K,2),(K,2) with mask."""
    uv_b_m = jnp.take(uv_b, matches.idx_b, axis=0)
    return uv_a, uv_b_m, matches.mask
