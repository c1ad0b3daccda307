"""Fused FED nonlinear-diffusion octave as one Pallas kernel.

The KAZE/AKAZE scale space (frontend/nonlinear.py) evolves the image by
Perona-Malik diffusion with FED step cycles: each explicit step needs a
light Gaussian blur (2 separable convs), Scharr gradients (2 convs), the
conductivity, and a 4-neighbor flux update — ~8 steps per octave. On this
runtime single-channel XLA convolutions cost ~0.8 ms EACH (BENCH_NOTES
round 4), so one octave costs tens of milliseconds. This kernel runs the
ENTIRE cycle VMEM-resident per row block: one HBM read of the halo-padded
block, n_steps of shift-add convs + flux updates, one write.

Halo: each FED step consumes blur(r=2) + scharr(1) + flux neighbor(1) =
4 px of support, so a cycle of n steps needs a 4*n halo. The wrapper pads
the image edge-replicated (zero-flux boundary analog); interior values
match the XLA path exactly, borders differ within the detector's masked
margin (validated in tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vislam_tpu.ops.harris_kernel import (
    _conv1d_cols,
    _conv1d_rows,
    _gauss_taps,
    _roll,
    _scharr_vmem,
)

_BH = 120  # block rows per grid step

_BLUR = _gauss_taps(2, 1.0)  # evolve()'s conductivity presmooth


def _kernel(taus, img_hbm, k_ref, out_ref, scratch, sem):
    b = pl.program_id(0)
    i = pl.program_id(1)
    halo = 4 * len(taus)
    cp = pltpu.make_async_copy(
        img_hbm.at[b, pl.ds(i * _BH, _BH + 2 * halo), :], scratch, sem)
    cp.start()
    cp.wait()
    L = scratch[:]
    k = k_ref[b]
    k2 = k * k

    for tau in taus:
        sm = _conv1d_cols(_conv1d_rows(L, _BLUR), _BLUR)
        gx, gy = _scharr_vmem(sm)
        g = 1.0 / (1.0 + (gx * gx + gy * gy) / k2)
        flux = jnp.zeros_like(L)
        for dv, du in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            Ln = _roll(_roll(L, -dv, 0), -du, 1)
            gn = _roll(_roll(g, -dv, 0), -du, 1)
            flux = flux + 0.5 * (g + gn) * (Ln - L)
        L = L + tau * flux

    out_ref[0, :, :] = L[halo:-halo, :]


@partial(jax.jit, static_argnames=("taus", "interpret"))
def _fed_evolve_batched(Ls, ks, taus: tuple, interpret: bool = False):
    """(B, H, W) images, (B,) contrast params -> (B, H, W). The batch folds
    into the kernel grid's leading dimension (one program per image per row
    block), so jax.vmap of callers reroutes here instead of dying inside
    pallas_call (ANY-space input needs a trivial index_map)."""
    B, H, W = Ls.shape
    halo = 4 * len(taus)
    ph = (-H) % _BH
    pw = (-(W + 2 * halo)) % 128
    Hb = H + ph
    Wp = W + 2 * halo + pw
    Lp = jnp.pad(Ls.astype(jnp.float32),
                 ((0, 0), (halo, halo + ph), (halo, halo + pw)), mode="edge")
    grid = Hb // _BH
    out = pl.pallas_call(
        partial(_kernel, tuple(float(t) for t in taus)),
        grid=(B, grid),
        out_shape=jax.ShapeDtypeStruct((B, Hb, Wp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, _BH, Wp), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_BH + 2 * halo, Wp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=B * H * W * 60 * len(taus), bytes_accessed=B * H * W * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Lp, ks.astype(jnp.float32))
    return out[:, :H, halo:halo + W]


def fed_evolve_pallas(L, k, taus: tuple, interpret: bool = False):
    """Evolve image(s) L (..., H, W) through the FED cycle `taus` (static
    tuple of floats) with contrast parameter(s) k (traced scalar, one per
    leading-batch element). Equivalent to frontend.nonlinear.evolve for
    interior pixels. Arbitrary leading dims fold into the kernel grid; the
    custom_vmap rule below makes jax.vmap of callers (batch/multi-sequence
    runners with scale_space="nonlinear") trace through (advisor, round 4 —
    same treatment as harris_nms_auto)."""
    if interpret:  # test path: no vmap involved
        lead = L.shape[:-2]
        out = _fed_evolve_batched(
            L.reshape((-1,) + L.shape[-2:]),
            jnp.reshape(jnp.asarray(k, jnp.float32), (-1,)),
            taus, interpret=True)
        return out.reshape(L.shape)
    return _fed_auto(tuple(float(t) for t in taus))(L, jnp.asarray(k))


_FED_AUTO_CACHE = {}


def _fed_auto(taus: tuple):
    if taus in _FED_AUTO_CACHE:
        return _FED_AUTO_CACHE[taus]

    @jax.custom_batching.custom_vmap
    def auto(L, k):
        lead = L.shape[:-2]
        out = _fed_evolve_batched(
            L.reshape((-1,) + L.shape[-2:]),
            jnp.reshape(k.astype(jnp.float32), (-1,)), taus)
        return out.reshape(L.shape)

    @auto.def_vmap
    def _rule(axis_size, in_batched, L, k):
        L_b, k_b = in_batched
        if not L_b:
            L = jnp.broadcast_to(L, (axis_size,) + L.shape)
        if not k_b:
            k = jnp.broadcast_to(jnp.reshape(k, (1,) * k.ndim),
                                 (axis_size,) + k.shape)
        out = _fed_evolve_batched(
            L.reshape((-1,) + L.shape[-2:]),
            jnp.reshape(k.astype(jnp.float32), (-1,)), taus)
        return out.reshape(L.shape), True

    _FED_AUTO_CACHE[taus] = auto
    return auto
