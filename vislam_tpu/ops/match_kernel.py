"""Fused descriptor-matching kernel: distance matrix + top-2 + reverse argmin.

Role of the hot loop the reference runs twice per frame on CPU or CUDA
(knnMatch both directions, /root/reference/src/Matcher.cpp:83-94,
src/MatcherGPU.cpp:44-66). One Pallas program computes the (K, K) squared-L2
matrix on the MXU and reduces it to exactly what the match filters need —
row-wise two smallest + argmin, and column-wise argmin for the symmetry
check — without the K x K matrix ever leaving VMEM (the jnp path
materializes it in HBM and re-reads it for each reduction).

K, D are compile-time constants (512, 128 by default): desc tiles
(512x128 f32 = 256 KB each) and the 512x512 distance tile (1 MB) fit VMEM
comfortably.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _distances(a, b, ma, mb):
    cross = jnp.dot(a, b.T, preferred_element_type=jnp.float32)  # MXU
    sqa = jnp.sum(a * a, axis=1, keepdims=True)
    sqb = jnp.sum(b * b, axis=1, keepdims=True)
    d = jnp.maximum(sqa + sqb.T - 2.0 * cross, 0.0)
    valid = (ma * mb.T) > 0.5
    return jnp.where(valid, d, _BIG)


def _reduce_top2(d, min1_ref, min2_ref, arg1_ref, colarg_ref):

    K = d.shape[1]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, d.shape, 0)

    # Row-wise min + argmin.
    min1 = jnp.min(d, axis=1, keepdims=True)
    is_min = d <= min1
    arg1 = jnp.min(jnp.where(is_min, col_ids, K), axis=1, keepdims=True)
    # Second smallest: mask out the argmin column per row.
    d2 = jnp.where(col_ids == arg1, _BIG, d)
    min2 = jnp.min(d2, axis=1, keepdims=True)

    # Column-wise argmin (for the mutual-consistency check).
    cmin = jnp.min(d, axis=0, keepdims=True)
    is_cmin = d <= cmin
    colarg = jnp.min(jnp.where(is_cmin, row_ids, K), axis=0, keepdims=True)

    min1_ref[:] = min1
    min2_ref[:] = min2
    arg1_ref[:] = arg1
    colarg_ref[:] = colarg.T


def _kernel(a_ref, b_ref, ma_ref, mb_ref, min1_ref, min2_ref, arg1_ref,
            colarg_ref):
    d = _distances(a_ref[:], b_ref[:], ma_ref[:], mb_ref[:])
    _reduce_top2(d, min1_ref, min2_ref, arg1_ref, colarg_ref)


def _make_gated_kernel(gate_radius: float):
    """Kernel variant with the guided-matching disc gate fused in: candidate
    pairs farther than gate_radius from the IMU-rotation-predicted position
    are excluded BEFORE the top-2 reduction (frontend/match.py gated path)."""
    r2 = float(gate_radius) * float(gate_radius)

    def kern(a_ref, b_ref, ma_ref, mb_ref, pu_ref, pv_ref, bu_ref, bv_ref,
             min1_ref, min2_ref, arg1_ref, colarg_ref):
        d = _distances(a_ref[:], b_ref[:], ma_ref[:], mb_ref[:])
        du = pu_ref[:] - bu_ref[:].T          # (K,1)-(1,K) -> (K,K)
        dv = pv_ref[:] - bv_ref[:].T
        d = jnp.where(du * du + dv * dv <= r2, d, _BIG)
        _reduce_top2(d, min1_ref, min2_ref, arg1_ref, colarg_ref)

    return kern


def _vmem_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


@partial(jax.jit, static_argnames=("interpret", "gate_radius"))
def match_top2_pallas(desc_a, mask_a, desc_b, mask_b, interpret: bool = False,
                      uv_pred=None, uv_b=None, gate_radius: float = 0.0):
    """Returns (min1 (K,), min2 (K,), arg1 (K,) int32, colarg (K,) int32).

    colarg[j] is the best A row for B column j (the reverse-direction argmin).
    With uv_pred/uv_b/gate_radius > 0, the guided-matching disc gate is fused
    into the kernel (gate_radius is compile-time static — it comes from the
    frontend config).
    """
    K, D = desc_a.shape
    ma = mask_a.astype(jnp.float32).reshape(K, 1)
    mb = mask_b.astype(jnp.float32).reshape(K, 1)
    out_shape = (
        jax.ShapeDtypeStruct((K, 1), jnp.float32),
        jax.ShapeDtypeStruct((K, 1), jnp.float32),
        jax.ShapeDtypeStruct((K, 1), jnp.int32),
        jax.ShapeDtypeStruct((K, 1), jnp.int32),
    )
    out_specs = tuple(_vmem_specs(4))
    cost = pl.CostEstimate(
        flops=2 * K * K * D, bytes_accessed=2 * K * D * 4 + 4 * K * 4,
        transcendentals=0,
    )
    gated = uv_pred is not None and uv_b is not None and gate_radius > 0.0
    if gated:
        args = (
            desc_a, desc_b, ma, mb,
            uv_pred[:, 0].reshape(K, 1), uv_pred[:, 1].reshape(K, 1),
            uv_b[:, 0].reshape(K, 1), uv_b[:, 1].reshape(K, 1),
        )
        out = pl.pallas_call(
            _make_gated_kernel(gate_radius),
            out_shape=out_shape, in_specs=_vmem_specs(8),
            out_specs=out_specs, cost_estimate=cost, interpret=interpret,
        )(*args)
    else:
        out = pl.pallas_call(
            _kernel,
            out_shape=out_shape, in_specs=_vmem_specs(4),
            out_specs=out_specs, cost_estimate=cost, interpret=interpret,
        )(desc_a, desc_b, ma, mb)
    min1, min2, arg1, colarg = out
    return min1[:, 0], min2[:, 0], arg1[:, 0], colarg[:, 0]


def match_descriptors_pallas(desc_a, mask_a, desc_b, mask_b, ratio: float = 0.8,
                             mutual: bool = True, interpret: bool = False):
    """Drop-in for frontend.match.match_descriptors (no grid dedup) built on
    the fused kernel. Returns a frontend.match.Matches."""
    from vislam_tpu.frontend.match import Matches

    K = desc_a.shape[0]
    min1, min2, arg1, colarg = match_top2_pallas(
        desc_a, mask_a, desc_b, mask_b, interpret=interpret
    )
    ok = mask_a & (min1 < _BIG * 0.5)
    ok &= min1 < (ratio * ratio) * jnp.maximum(min2, 1e-12)
    if mutual:
        safe_arg = jnp.clip(arg1, 0, K - 1)
        ok &= jnp.take(colarg, safe_arg) == jnp.arange(K)
    return Matches(
        idx_b=jnp.clip(arg1, 0, K - 1),
        dist=jnp.sqrt(jnp.maximum(min1, 0.0)),
        mask=ok,
    )
