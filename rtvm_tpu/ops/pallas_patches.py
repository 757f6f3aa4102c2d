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
  1. an ALIGNED [patch+8, roundup(patch+128, 128)] load at
     (8*floor(y/8), 128*floor(x/128)) — `pl.multiple_of` carries the proof;
  2. row phase (y mod 8): ONE dynamic sublane `pltpu.roll` (the hardware
     rotate takes a traced shift), then a static [:patch] slice;
  3. lane phase (x mod 128): ONE dynamic lane `pltpu.roll`, then a static
     [:, :patch] slice.
The lane extent MUST be a multiple of 128: Mosaic's dynamic lane rotate on a
partially-padded vreg row (e.g. 160 = 1.25 vregs) hits an internal layout
error on chip ("tpu.dynamic_rotate ... vector<32x160xf32>", jax 0.8 era);
rotates on full-vreg widths (128/256) compile and are exact (probed on v5e,
round 4).
Set RTVM_PALLAS_DYNROLL=0 to fall back to the round-3 static decomposition
(8-way row-phase where-chain + 7 bit-gated static rolls — ~22 vector ops per
patch vs 2 rotates).

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


def _lane_extent(patch: int) -> int:
    """Aligned lane extent of each in-kernel load (full-vreg multiple, see
    module docstring). Single source of truth: the caller's lane padding MUST
    cover exactly this extent or the aligned load reads out of bounds."""
    return _round_up(patch + 128, 128)


def _dynroll_enabled() -> bool:
    import os

    return os.environ.get("RTVM_PALLAS_DYNROLL", "1") != "0"


def _make_kernel(patch: int, dynroll: bool):
    lw = _lane_extent(patch)
    ns = patch + 8  # aligned sublane extent per load

    def kernel(ys_ref, xs_ref, img_ref, out_ref):
        q0 = pl.program_id(0) * QB

        def body(i, _):
            y = ys_ref[q0 + i]
            x = xs_ref[q0 + i]
            y8 = pl.multiple_of((y // 8) * 8, 8)
            x128 = pl.multiple_of((x // 128) * 128, 128)
            blk = img_ref[pl.ds(y8, ns), pl.ds(x128, lw)]
            pr = y - y8  # row phase in [0, 8)
            sh = x - x128  # lane phase in [0, 128)
            if dynroll:
                # out[r] = blk[r + pr]: rotate UP by pr == rotate down by
                # (ns - pr) % ns; r + pr <= patch-1+7 < ns so no wraparound
                # enters the kept [:patch] slice. Same for lanes.
                rows = pltpu.roll(blk, shift=(ns - pr) % ns, axis=0)[:patch]
                cur = pltpu.roll(rows, shift=(lw - sh) % lw, axis=1)
            else:
                # static fallback: 8-way row select + 7 bit-gated lane rolls
                rows = blk[:patch]
                for p in range(1, 8):
                    rows = jnp.where(pr == p, blk[p : p + patch], rows)
                cur = rows
                for b in (64, 32, 16, 8, 4, 2, 1):
                    cur = jnp.where(
                        (sh & b) != 0, pltpu.roll(cur, shift=lw - b, axis=1), cur
                    )
            out_ref[i] = cur[:, :patch]
            return 0

        jax.lax.fori_loop(0, QB, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("patch", "interpret", "dynroll"))
def _extract_patches_impl(
    stacked: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    patch: int,
    interpret: bool,
    dynroll: bool,
) -> jnp.ndarray:
    """stacked [R, W] f32 (levels stacked vertically), ys/xs [Q] int32 patch
    origins (pre-clipped: ys <= R - patch, xs <= W - patch) -> [Q, patch, patch].
    """
    r, w = stacked.shape
    q = ys.shape[0]
    qp = _round_up(max(q, QB), QB)
    # slack for the aligned loads: rows up to 8*floor(y/8)+patch+8, lanes up
    # to 128*floor(x/128) + _lane_extent(patch)
    lw = _lane_extent(patch)
    wp = _round_up(w, 128) + lw
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
        _make_kernel(patch, dynroll),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((qp, patch, patch), stacked.dtype),
        interpret=interpret,
    )(ysp, xsp, img)
    return out[:q]


def extract_patches_pallas(
    stacked: jnp.ndarray,
    ys: jnp.ndarray,
    xs: jnp.ndarray,
    patch: int = 32,
    interpret: bool = False,
    dynroll: bool | None = None,
) -> jnp.ndarray:
    """stacked [R, W] float (levels stacked vertically), ys/xs [Q] int32 patch
    origins (pre-clipped: ys <= R - patch, xs <= W - patch) -> [Q, patch, patch].
    dynroll=None reads RTVM_PALLAS_DYNROLL (default on)."""
    if dynroll is None:
        dynroll = _dynroll_enabled()
    return _extract_patches_impl(stacked, ys, xs, patch, interpret, dynroll)
