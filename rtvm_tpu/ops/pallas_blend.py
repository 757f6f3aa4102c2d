"""Feathered canvas blend as a Pallas TPU kernel.

The blend is the one stage of warp_blend that touches the full canvas every frame
(3+1 channels read + written). XLA already fuses it well, but expressing it as a
Pallas kernel pins the tiling ([block_h x 128] lanes over the canvas), keeps all four
channels resident in VMEM per tile, and removes any fusion-boundary risk inside the
scan body. Falls back to the jnp implementation off-TPU.

Semantics identical to warp._blend_cm: feather weights w_new/(w_new + w_old) in the
overlap, hard copy where only one side has content, weight map = running max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blend_kernel(canvas_ref, cw_ref, new_ref, nw_ref, out_ref, ow_ref):
    cw = cw_ref[:]
    nw = nw_ref[:]
    has_new = nw > 0.0
    has_old = cw > 0.0
    alpha = nw / (nw + cw + 1e-6)
    c = canvas_ref[:]
    n = new_ref[:]
    blended = alpha[None] * n + (1.0 - alpha[None]) * c
    out_ref[:] = jnp.where(
        (has_new & has_old)[None], blended, jnp.where(has_new[None], n, c)
    )
    ow_ref[:] = jnp.maximum(cw, nw)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def blend_pallas(
    canvas: jnp.ndarray,
    canvas_weight: jnp.ndarray,
    new_px: jnp.ndarray,
    w_new: jnp.ndarray,
    block_h: int = 128,
    interpret: bool = False,
):
    """canvas [3, Hc, Wc], canvas_weight [Hc, Wc], new_px [3, Hc, Wc], w_new [Hc, Wc]
    -> (canvas', weight'). Hc must be divisible by block_h (canvas sizes are padded
    to 128 multiples by construction)."""
    c, hc, wc = canvas.shape
    grid = (hc // block_h,)

    img_spec = pl.BlockSpec(
        (c, block_h, wc), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((block_h, wc), lambda i: (i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _blend_kernel,
        grid=grid,
        in_specs=[img_spec, w_spec, img_spec, w_spec],
        out_specs=[img_spec, w_spec],
        out_shape=[
            jax.ShapeDtypeStruct(canvas.shape, canvas.dtype),
            jax.ShapeDtypeStruct(canvas_weight.shape, canvas_weight.dtype),
        ],
        interpret=interpret,
    )(canvas, canvas_weight, new_px, w_new)
