"""Gather-based image sampling (the TPU replacement for cv2.remap / warpPerspective's
interpolation core and for per-keypoint patch extraction)."""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinearly sample img [H, W] or [H, W, C] at float coords (xs, ys) of any shape.
    Out-of-range coordinates are clamped (caller should mask by in-bounds separately)."""
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.clip(jnp.floor(xs), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 2).astype(jnp.int32)
    fx = jnp.clip(xs - x0, 0.0, 1.0)
    fy = jnp.clip(ys - y0, 0.0, 1.0)
    if img.ndim == 3:
        fx = fx[..., None]
        fy = fy[..., None]
    p00 = img[y0, x0]
    p01 = img[y0, x0 + 1]
    p10 = img[y0 + 1, x0]
    p11 = img[y0 + 1, x0 + 1]
    top = p00 * (1.0 - fx) + p01 * fx
    bot = p10 * (1.0 - fx) + p11 * fx
    return top * (1.0 - fy) + bot * fy


def nearest_sample(img: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sample with clamped rounding (cvRound semantics)."""
    h, w = img.shape[0], img.shape[1]
    xi = jnp.clip(jnp.round(xs), 0, w - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.round(ys), 0, h - 1).astype(jnp.int32)
    return img[yi, xi]


def gather_patches(img: jnp.ndarray, cx: jnp.ndarray, cy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Extract (2r+1)x(2r+1) patches around integer centers (cx, cy) [K] -> [K, P, P].
    Border patches are clamped to the image."""
    h, w = img.shape
    d = jnp.arange(-radius, radius + 1)
    ys = jnp.clip(cy[:, None, None] + d[None, :, None], 0, h - 1)
    xs = jnp.clip(cx[:, None, None] + d[None, None, :], 0, w - 1)
    return img[ys, xs]
