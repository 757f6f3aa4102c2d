"""Edge-preserving disparity refinement + speckle suppression.

The reference's SGBM mode runs cv2.ximgproc WLS filtering (lambda 8000, sigma 1.5)
and its BM mode relies on cv2.filterSpeckles (stereo_depth.py:76-99). TPU-native
equivalents:

- ``guided_refine``: confidence-weighted guided filter (He et al.) with the left
  gray image as guide — the same edge-preserving least-squares objective WLS
  minimizes, but expressed entirely as separable box filters (cumsum-based, all
  static-shape elementwise/reduction work XLA fuses well). Invalid pixels carry
  zero confidence: holes are in-filled from valid neighbours on the same side of
  an image edge.
- ``speckle_suppress``: local-support speckle test — a disparity survives only if
  enough pixels in its window agree within max_diff (box-filtered indicator).
  Matches cv2.filterSpeckles behaviour for the small isolated blobs that matter,
  without connected components (which do not map to XLA).

Both are jitted and run per-frame on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _box(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Separable (2r+1)^2 box sum with edge-replicate padding, via padded cumsum."""
    for axis in (0, 1):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r + 1, r)
        c = jnp.cumsum(jnp.pad(x, pad, mode="edge"), axis=axis)
        n = x.shape[axis]
        hi = jax.lax.slice_in_dim(c, 2 * r + 1, 2 * r + 1 + n, axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
        x = hi - lo
    return x


@functools.partial(jax.jit, static_argnames=("radius",))
def guided_refine(
    disparity: jnp.ndarray,
    guide_gray: jnp.ndarray,
    radius: int = 8,
    eps: float = 40.0,
) -> jnp.ndarray:
    """Confidence-weighted guided filter of a disparity map.

    disparity: [H, W], invalid marked -1. guide_gray: [H, W] float intensities
    (0..255 scale; eps is in intensity^2 units). Returns refined disparity with
    holes filled where any window support exists, -1 elsewhere.
    """
    d = disparity.astype(jnp.float32)
    g = guide_gray.astype(jnp.float32)
    conf = (d >= 0.0).astype(jnp.float32)
    dz = jnp.where(conf > 0, d, 0.0)

    n = _box(jnp.ones_like(g), radius)
    nc = _box(conf, radius)
    ok = nc > 0.5

    mean_g = _box(g, radius) / n
    var_g = _box(g * g, radius) / n - mean_g**2
    mean_d = _box(dz, radius) / jnp.maximum(nc, 1e-6)
    # covariance over valid samples only
    mean_gd = _box(g * dz, radius) / jnp.maximum(nc, 1e-6)
    mean_g_v = _box(g * conf, radius) / jnp.maximum(nc, 1e-6)
    cov = mean_gd - mean_g_v * mean_d

    a = cov / (var_g + eps)
    b = mean_d - a * mean_g_v
    mean_a = _box(a, radius) / n
    mean_b = _box(b, radius) / n
    out = mean_a * g + mean_b
    return jnp.where(ok, jnp.maximum(out, 0.0), -1.0)


@functools.partial(jax.jit, static_argnames=("radius",))
def speckle_suppress(
    disparity: jnp.ndarray,
    radius: int = 6,
    max_diff: float = 1.5,
    min_support: int = 24,
) -> jnp.ndarray:
    """Remove small isolated disparity blobs (cv2.filterSpeckles stand-in).

    A pixel survives when >= min_support pixels inside its (2r+1)^2 window have a
    disparity within max_diff of it. Isolated speckles (blob area below
    min_support) cannot reach the support count and are invalidated.
    """
    d = disparity.astype(jnp.float32)
    valid = d >= 0.0
    # O(K * HW) with K = (2r+1)^2 static window offsets: each step is a roll, a
    # compare and an add — XLA fuses the whole accumulation into a few kernels,
    # and K=169 adds over a 360p map is negligible arithmetic.
    h, w = d.shape
    # Invalid pixels and the border never support anyone.
    pad = jnp.pad(jnp.where(valid, d, -1e6), radius, constant_values=-1e6)
    supp = jnp.zeros_like(d)
    for dy in range(2 * radius + 1):
        for dx in range(2 * radius + 1):
            nbp = pad[dy : dy + h, dx : dx + w]
            supp = supp + (jnp.abs(nbp - d) <= max_diff).astype(jnp.float32)
    keep = valid & (supp >= min_support)
    return jnp.where(keep, d, -1.0)
