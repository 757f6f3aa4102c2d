"""CLAHE (contrast-limited adaptive histogram equalization) as vectorized JAX ops.

Replaces cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)) used by the reference's
detection pre-enhancement (_enhance_for_detection, reference main.py:133-147). Tile
histograms are built with a one-hot matmul, clipped and redistributed, and the per-tile
LUTs are applied with bilinearly-interpolated tile weights (standard CLAHE smoothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def clahe(gray: jnp.ndarray, clip_limit: float = 3.0, grid: int = 8) -> jnp.ndarray:
    """gray [H, W] float 0..255 -> equalized [H, W] float 0..255."""
    h, w = gray.shape
    th, tw = -(-h // grid), -(-w // grid)  # ceil tile sizes
    ph, pw = th * grid - h, tw * grid - w
    img = jnp.pad(gray, ((0, ph), (0, pw)), mode="edge")
    hp, wp = img.shape

    vals = jnp.clip(img, 0, 255).astype(jnp.int32)
    tiles = vals.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid * grid, -1)
    onehot = jax.nn.one_hot(tiles, 256, dtype=jnp.float32)  # [T, N, 256]
    hist = onehot.sum(axis=1)  # [T, 256]

    # clip + redistribute excess uniformly
    npix = th * tw
    limit = clip_limit * npix / 256.0
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=1)
    luts = (cdf - cdf[:, :1]) / jnp.maximum(cdf[:, -1:] - cdf[:, :1], 1.0) * 255.0  # [T, 256]
    luts = luts.reshape(grid, grid, 256)

    # bilinear interpolation between the 4 surrounding tile LUTs
    ys = jnp.arange(hp, dtype=jnp.float32)
    xs = jnp.arange(wp, dtype=jnp.float32)
    gy = (ys - th / 2.0) / th
    gx = (xs - tw / 2.0) / tw
    y0 = jnp.clip(jnp.floor(gy), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(gx), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(gy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(gx - x0, 0.0, 1.0)[None, :]

    v = vals
    l00 = luts[y0[:, None], x0[None, :], v]
    l01 = luts[y0[:, None], x1[None, :], v]
    l10 = luts[y1[:, None], x0[None, :], v]
    l11 = luts[y1[:, None], x1[None, :], v]
    out = (
        l00 * (1 - fy) * (1 - fx)
        + l01 * (1 - fy) * fx
        + l10 * fy * (1 - fx)
        + l11 * fy * fx
    )
    return out[:h, :w]


def enhance_for_detection(bgr: jnp.ndarray, clip_limit: float = 3.0, grid: int = 8) -> jnp.ndarray:
    """LAB-L CLAHE enhancement (reference main.py:133-147) approximated via luma
    scaling: equalize luma, rescale BGR channels proportionally."""
    from rtvm_tpu.ops.color import bgr2gray

    img = bgr.astype(jnp.float32)
    luma = bgr2gray(img)
    eq = clahe(luma, clip_limit, grid)
    gain = eq / jnp.maximum(luma, 1.0)
    gain = jnp.clip(gain, 0.25, 4.0)
    return jnp.clip(img * gain[..., None], 0, 255)
