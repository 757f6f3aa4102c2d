"""Obstacle-mask construction — the TPU side of the navigation-map builder.

Behavioral port of the mask-building stages of reference analyze_for_navigation
(main.py:1068-1232): class-weighted detection buffers, fire/smoke color masks,
texture-anomaly mask, and the navigation dilation. All image-sized compute (HSV
thresholds, box filters, local variance, morphology) runs as one jitted JAX function;
only the per-detection box rasterization stays host-side (a handful of rectangles).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.detect.classes import OBSTACLE_GROUPS
from rtvm_tpu.ops import color, filters

# (buffer px, weight) per obstacle group (reference main.py:1068-1130).
GROUP_PARAMS = {
    "danger": (40, 1.0),
    "vehicle": (25, 0.9),
    "living": (20, 0.85),
    "static": (15, 0.7),
}


def detection_obstacle_mask(shape: Tuple[int, int], detections: List[dict]) -> np.ndarray:
    """Rasterize detection boxes with class-dependent buffers scaled by object size.
    Returns float32 [H, W] weights in [0, 1]."""
    h, w = shape
    mask = np.zeros((h, w), np.float32)
    for d in detections:
        cls = d.get("class", "")
        grp = next((g for g, classes in OBSTACLE_GROUPS.items() if cls in classes), None)
        if grp is None:
            continue
        buf, weight = GROUP_PARAMS[grp]
        x1, y1, x2, y2 = [int(v) for v in d["bbox"]]
        # buffer scales with object area (reference scales by sqrt(area)/20)
        area = max((x2 - x1) * (y2 - y1), 1)
        scale = float(np.clip(np.sqrt(area) / 100.0, 0.5, 2.0))
        b = int(buf * scale)
        xa, ya = max(x1 - b, 0), max(y1 - b, 0)
        xb, yb = min(x2 + b, w), min(y2 + b, h)
        mask[ya:yb, xa:xb] = np.maximum(mask[ya:yb, xa:xb], weight)
    return mask


@jax.jit
def color_texture_masks(img: jnp.ndarray):
    """Fire, smoke, and texture-anomaly masks for a [H, W, 3] BGR uint8 image.

    Fire (main.py:1141-1172): three hue bands (red/orange/yellow) with high
    saturation + brightness, plus BGR dominance rules, edge-assisted.
    Smoke (main.py:1174-1205): low-saturation bright-gray regions with low local
    texture variance.
    Texture (main.py:1207-1232): |gray - blur11| > 6 inside the eroded valid area.
    """
    imgf = img.astype(jnp.float32)
    hsv = color.bgr2hsv(imgf)
    hch, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    b, g, r = imgf[..., 0], imgf[..., 1], imgf[..., 2]
    valid = jnp.any(imgf > 10.0, axis=-1)

    fire_h = ((hch <= 10) | (hch >= 170) | ((hch >= 11) & (hch <= 25)) | ((hch >= 26) & (hch <= 35)))
    fire_hsv = fire_h & (s > 120) & (v > 150)
    fire_bgr = ((r > 180) & (r > g * 1.5) & (r > b * 1.8)) | ((r > 200) & (g > 120) & (b < 100))
    fire = (fire_hsv | fire_bgr) & valid

    gray = color.bgr2gray(imgf)
    local_mean = filters.box_blur(gray, 11)
    local_sq = filters.box_blur(gray * gray, 11)
    local_std = jnp.sqrt(jnp.maximum(local_sq - local_mean**2, 0.0))
    grayish = (jnp.abs(r - g) < 25) & (jnp.abs(g - b) < 25) & (jnp.abs(r - b) < 25)
    smoke_hsv = ((s < 40) & (v > 100) & (v < 220)) | ((s < 60) & (v > 140))
    smoke = (smoke_hsv | grayish) & (gray > 70) & (local_std < 12.0) & valid

    texture = (jnp.abs(gray - filters.gaussian_blur(gray, 2.0, 5)) > 6.0) & (
        filters.erode(valid.astype(jnp.float32), 5) > 0
    )

    return fire, smoke, texture


import functools


@functools.partial(jax.jit, static_argnums=(4,))
def combine_and_dilate(
    det_mask: jnp.ndarray,
    fire: jnp.ndarray,
    smoke: jnp.ndarray,
    texture: jnp.ndarray,
    dilate_size: int = 15,
):
    """Final navigation obstacle mask: union of sources, dilated for clearance
    (reference main.py:1226-1232)."""
    m = jnp.maximum(det_mask, fire.astype(jnp.float32))
    m = jnp.maximum(m, smoke.astype(jnp.float32) * 0.8)
    m = jnp.maximum(m, texture.astype(jnp.float32) * 0.5)
    nav = filters.dilate((m > 0.3).astype(jnp.float32), dilate_size)
    return m, nav > 0


def build_obstacle_masks(image_bgr: np.ndarray, detections: List[dict], dilate_size: int = 15):
    """Full mask pipeline. Returns (obstacle_weights [H,W] f32, nav_blocked [H,W] bool)."""
    det_mask = detection_obstacle_mask(image_bgr.shape[:2], detections)
    fire, smoke, texture = color_texture_masks(jnp.asarray(image_bgr))
    m, nav = combine_and_dilate(jnp.asarray(det_mask), fire, smoke, texture, dilate_size)
    return np.asarray(m), np.asarray(nav)
