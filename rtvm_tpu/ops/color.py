"""Color-space conversions as pure jnp ops (VPU elementwise; XLA fuses them into
neighbouring kernels).

Replaces the reference's cv2.cvtColor calls (BGR2GRAY main.py:717, BGR2HSV main.py:489,
BGR2LAB main.py:137). Frames follow the reference's BGR channel order throughout so the
two pipelines are drop-in comparable.
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights, matching cv2.COLOR_BGR2GRAY.
_B_W, _G_W, _R_W = 0.114, 0.587, 0.299


def bgr2gray(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] BGR (any numeric dtype) -> [..., H, W] float32 gray."""
    img = img.astype(jnp.float32)
    return img[..., 0] * _B_W + img[..., 1] * _G_W + img[..., 2] * _R_W


def bgr2hsv(img: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] BGR uint8-range -> [..., H, W, 3] HSV with OpenCV's 8-bit ranges
    (H in [0, 180), S,V in [0, 255]). Used by fire/smoke/soil color masks."""
    img = img.astype(jnp.float32) / 255.0
    b, g, r = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(b, g), r)
    mn = jnp.minimum(jnp.minimum(b, g), r)
    c = v - mn
    safe_c = jnp.where(c > 0, c, 1.0)
    h_r = (g - b) / safe_c
    h_g = 2.0 + (b - r) / safe_c
    h_b = 4.0 + (r - g) / safe_c
    h = jnp.where(v == r, h_r, jnp.where(v == g, h_g, h_b))
    h = jnp.where(c > 0, h, 0.0)
    h = (h * 60.0) % 360.0
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h / 2.0, s * 255.0, v * 255.0], axis=-1)


def gray2bgr(gray: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([gray, gray, gray], axis=-1)
