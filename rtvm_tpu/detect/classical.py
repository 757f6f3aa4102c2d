"""Classical (non-learned) aerial detectors.

Behavioral ports of the reference's CV fallback detectors: the watershed building
detector (_detect_buildings_cv2, reference main.py:466-631) and the bright-region
vehicle detector (_detect_vehicles_cv2, main.py:633-674). Color masks, thresholds and
morphology run as JAX ops on the TPU; the irreducibly sequential parts (watershed
flooding, contour extraction + polygon stats) stay host-side per the design in
SURVEY.md section 2.6.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import color, filters


@jax.jit
def _building_masks(img: jnp.ndarray):
    """TPU part of the building detector: gray-roof HSV mask + edge map."""
    hsv = color.bgr2hsv(img)
    s, v = hsv[..., 1], hsv[..., 2]
    valid = jnp.any(img > 0, axis=-1)
    roof = (s <= 50) & (v >= 60) & (v <= 220) & valid
    gray = color.bgr2gray(img)
    gx, gy = filters.sobel(filters.gaussian_blur(gray, 1.4))
    mag = jnp.sqrt(gx * gx + gy * gy)
    # hysteresis-free Canny stand-in: strong edges dilated (reference dilates Canny x3)
    edges = filters.dilate((mag > 120).astype(jnp.float32), 3, iterations=3) > 0
    roof_clean = filters.morph_open(roof.astype(jnp.float32), 3, iterations=2) > 0
    return roof_clean, edges


def detect_buildings_classical(
    image_bgr: np.ndarray, debug_path: "str | None" = None
) -> List[dict]:
    """Gray-roof building candidates via mask -> watershed -> contour filters
    (parity with reference main.py:466-577 thresholds). debug_path, when set,
    receives the separated-buildings mask (the reference writes
    debug_watershed.jpg unconditionally at main.py:531)."""
    import cv2

    h, w = image_bgr.shape[:2]
    roof, edges = _building_masks(jnp.asarray(image_bgr))
    mask = (np.asarray(roof) & ~np.asarray(edges)).astype(np.uint8) * 255
    if debug_path:
        cv2.imwrite(debug_path, mask)

    # watershed split of touching roofs (host-side)
    dist = cv2.distanceTransform(mask, cv2.DIST_L2, 5)
    fg = (dist > 0.3 * max(dist.max(), 1e-6)).astype(np.uint8)
    bg = cv2.dilate(mask, np.ones((3, 3), np.uint8), iterations=3)
    unknown = cv2.subtract(bg, fg * 255)
    n, markers = cv2.connectedComponents(fg)
    markers = markers + 1
    markers[unknown > 0] = 0
    cv2.watershed(cv2.cvtColor(mask, cv2.COLOR_GRAY2BGR), markers)

    out = []
    max_area = 0.08 * h * w
    for lbl in range(2, markers.max() + 1):
        m = (markers == lbl).astype(np.uint8)
        area = int(m.sum())
        if area < 400 or area > max_area:
            continue
        cnts, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        if not cnts:
            continue
        c = max(cnts, key=cv2.contourArea)
        x, y, bw, bh = cv2.boundingRect(c)
        if min(bw, bh) < 15:
            continue
        rect_area = bw * bh
        rectangularity = area / max(rect_area, 1)
        if rectangularity < 0.35:
            continue
        aspect = max(bw, bh) / max(min(bw, bh), 1)
        if aspect > 5:
            continue
        approx = cv2.approxPolyDP(c, 0.02 * cv2.arcLength(c, True), True)
        if len(approx) < 4:
            continue
        conf = min(0.75, rectangularity * 0.5 + 0.2)
        out.append(
            {"bbox": [int(x), int(y), int(x + bw), int(y + bh)], "class": "building",
             "confidence": float(conf), "source": "classical"}
        )
    return out


@jax.jit
def _vehicle_mask(img: jnp.ndarray):
    gray = color.bgr2gray(img)
    valid = gray > 10
    bright = (gray > 180) & valid
    m = filters.morph_close(bright.astype(jnp.float32), 3, iterations=2)
    m = filters.morph_open(m, 3, iterations=1)
    return m > 0


def detect_vehicles_classical(image_bgr: np.ndarray) -> List[dict]:
    """Bright-blob vehicle candidates (parity with reference main.py:633-674
    thresholds: area 150-8000, aspect 0.3-4, min dim 8, max dim 150, extent > 0.5)."""
    import cv2

    mask = np.asarray(_vehicle_mask(jnp.asarray(image_bgr))).astype(np.uint8)
    cnts, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    out = []
    for c in cnts:
        area = cv2.contourArea(c)
        if area < 150 or area > 8000:
            continue
        x, y, bw, bh = cv2.boundingRect(c)
        aspect = bw / max(bh, 1)
        if aspect < 0.3 or aspect > 4:
            continue
        if min(bw, bh) <= 8 or max(bw, bh) >= 150:
            continue
        extent = area / max(bw * bh, 1)
        if extent <= 0.5:
            continue
        out.append(
            {"bbox": [int(x), int(y), int(x + bw), int(y + bh)], "class": "car",
             "confidence": float(0.3 + extent * 0.3), "source": "classical"}
        )
    return out
