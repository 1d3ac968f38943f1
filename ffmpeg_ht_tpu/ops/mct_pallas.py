"""Fused inverse-RCT + DC shift/clip as a Pallas TPU kernel (K5).

The reference implements this stage as hand-written SIMD
(x86/jpeg2000dsp.asm ff_rct_int_* plus write_frame_8/16,
jpeg2000dec.c:2301-2364); the TPU equivalent is one VMEM-resident
elementwise kernel over the three tile-component planes, emitting the
final clipped pixel values in one pass (no intermediate HBM round-trips
between MCT and the DC shift).

Falls back to plain jnp when Pallas is unavailable (CPU interpret mode is
used for tests via interpret=True).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _kernel(y0_ref, y1_ref, y2_ref, r_ref, g_ref, b_ref, *, shift, maxval):
    y0 = y0_ref[:]
    y1 = y1_ref[:]
    y2 = y2_ref[:]
    # inverse RCT in wraparound int32 (jpeg2000dsp.c:78-91)
    g = y0 - ((y2 + y1) >> 2)
    r = g + y2
    b = g + y1
    r_ref[:] = jnp.clip(r + shift, 0, maxval)
    g_ref[:] = jnp.clip(g + shift, 0, maxval)
    b_ref[:] = jnp.clip(b + shift, 0, maxval)


@functools.partial(jax.jit, static_argnames=("cbps", "interpret"))
def rct_writeframe(y0, y1, y2, cbps: int, interpret: bool = False):
    """(Y, Cb, Cr) int32 planes -> clipped (R, G, B) int32 planes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shift = 1 << (cbps - 1)
    maxval = (1 << cbps) - 1
    shape = jax.ShapeDtypeStruct(y0.shape, jnp.int32)
    kern = functools.partial(_kernel, shift=shift, maxval=maxval)
    return pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(y0, y1, y2)


def rct_writeframe_ref(y0, y1, y2, cbps: int):
    """jnp reference implementation (for parity tests / fallback)."""
    shift = 1 << (cbps - 1)
    maxval = (1 << cbps) - 1
    g = y0 - ((y2 + y1) >> 2)
    r = g + y2
    b = g + y1
    return (jnp.clip(r + shift, 0, maxval),
            jnp.clip(g + shift, 0, maxval),
            jnp.clip(b + shift, 0, maxval))
