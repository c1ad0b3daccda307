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
    k = k_ref[0]
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
def fed_evolve_pallas(L, k, taus: tuple, interpret: bool = False):
    """Evolve (H, W) image L through the FED cycle `taus` (static tuple of
    floats) with contrast parameter k (traced scalar). Equivalent to
    frontend.nonlinear.evolve for interior pixels."""
    H, W = L.shape
    halo = 4 * len(taus)
    ph = (-H) % _BH
    pw = (-(W + 2 * halo)) % 128
    Hb = H + ph
    Wp = W + 2 * halo + pw
    Lp = jnp.pad(L.astype(jnp.float32),
                 ((halo, halo + ph), (halo, halo + pw)), mode="edge")
    grid = Hb // _BH
    out = pl.pallas_call(
        partial(_kernel, tuple(float(t) for t in taus)),
        grid=(1, grid),
        out_shape=jax.ShapeDtypeStruct((1, Hb, Wp), jnp.float32),
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
            flops=H * W * 60 * len(taus), bytes_accessed=H * W * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(Lp[None], jnp.reshape(jnp.asarray(k, jnp.float32), (1,)))
    return out[0, :H, halo:halo + W]
