"""Pallas TPU kernel: per-keypoint patch extraction from a VMEM-resident image.

The XLA path (vmap'd dynamic_slice, ops/features/sift._extract_level_patches)
is dominated by per-slice dispatch overhead — measured ~1.4 us per keypoint on
v5e regardless of slice bytes (f32 vs bf16) or row count (2- vs 8-row
interleave), i.e. ~1 ms/frame at 700 keypoints. Here the whole level-stacked
image sits in VMEM (a 360p octave stack is ~2.8 MB) and ONE kernel loops over
keypoints, so the per-patch cost is actual VMEM copy instructions instead of
XLA slice dispatches.

Mosaic requires dynamic load offsets to be provably aligned (sublanes: 8,
lanes: 128), so each patch is cut as:
  1. an ALIGNED [patch+8, patch+128] load at (8*floor(y/8), 128*floor(x/128))
     — `pl.multiple_of` carries the proof;
  2. row-phase select: 8-way where-chain over static sublane slices;
  3. lane shift by (x mod 128): log2 decomposition into 7 static
     `pltpu.roll`s gated by the shift's bits (a dynamic lane rotate without
     relying on dynamic-shift support), then a static [:, :patch] slice.

Used by the SIFT descriptor path on real TPU (sift.detect_and_describe tiers
on backend, like mosaic.stitcher._use_pallas_warp); the XLA interleave path
remains the CPU/test implementation. Both produce EXACT integer-aligned
patches (pure copies, no resampling) — parity is tested in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QB = 16  # keypoints per grid program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _make_kernel(patch: int):
    lw = patch + 128  # aligned lane extent per load

    def kernel(ys_ref, xs_ref, img_ref, out_ref):
        q0 = pl.program_id(0) * QB

        def body(i, _):
            y = ys_ref[q0 + i]
            x = xs_ref[q0 + i]
            y8 = pl.multiple_of((y // 8) * 8, 8)
            x128 = pl.multiple_of((x // 128) * 128, 128)
            blk = img_ref[pl.ds(y8, patch + 8), pl.ds(x128, lw)]
            # row phase: 8-way select over static sublane slices
            pr = y - y8
            rows = blk[:patch]
            for p in range(1, 8):
                rows = jnp.where(pr == p, blk[p : p + patch], rows)
            # lane phase: shift left by sh = x - x128 in [0, 128) via static
            # rolls gated by sh's bits; lanes 0..patch-1 never see wrap-around
            # (patch + 127 <= lw)
            sh = x - x128
            cur = rows
            for b in (64, 32, 16, 8, 4, 2, 1):
                cur = jnp.where(
                    (sh & b) != 0, pltpu.roll(cur, shift=lw - b, axis=1), cur
                )
            out_ref[i] = cur[:, :patch]
            return 0

        jax.lax.fori_loop(0, QB, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("patch", "interpret"))
def extract_patches_pallas(
    stacked: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    patch: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """stacked [R, W] f32 (levels stacked vertically), ys/xs [Q] int32 patch
    origins (pre-clipped: ys <= R - patch, xs <= W - patch) -> [Q, patch, patch].
    """
    r, w = stacked.shape
    q = ys.shape[0]
    qp = _round_up(max(q, QB), QB)
    # slack for the aligned loads: rows up to 8*floor(y/8)+patch+8, lanes up to
    # 128*floor(x/128)+patch+128
    wp = _round_up(w + 128, 128)
    rp = _round_up(r + 8, 8)
    img = jnp.pad(stacked, ((0, rp - r), (0, wp - w)))
    ysp = jnp.pad(ys.astype(jnp.int32), (0, qp - q))
    xsp = jnp.pad(xs.astype(jnp.int32), (0, qp - q))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(qp // QB,),
        in_specs=[
            pl.BlockSpec((rp, wp), lambda i, ys, xs: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (QB, patch, patch), lambda i, ys, xs: (i, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        _make_kernel(patch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, patch, patch), stacked.dtype),
        interpret=interpret,
    )(ysp, xsp, img)
    return out[:q]
