"""Navigation-map rendering — host-side drawing over TPU-produced masks.

Behavioral port of the drawing/routing stages of reference analyze_for_navigation
(main.py:1234-1495): red obstacle contours, white start marker (bottom-center), green
smoothed A* route per building with straight-line / one-bend / dotted fallbacks, and a
Cyrillic legend (PIL TTF with graceful fallback to cv2 text)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from rtvm_tpu.navigate.astar import find_path_astar, is_path_clear, smooth_path
from rtvm_tpu.navigate.obstacles import build_obstacle_masks
from rtvm_tpu.utils.image import draw_dotted_line

LEGEND = [
    ("Маршрут", (0, 255, 0)),
    ("Препятствия", (0, 0, 255)),
    ("Старт", (255, 255, 255)),
]


def _put_text(img, text, pos, color, size=16):
    """PIL TTF text with Cyrillic support; falls back to cv2 (reference
    main.py:1254-1279 font fallback chain)."""
    try:
        from PIL import Image, ImageDraw, ImageFont

        font = None
        for name in ("DejaVuSans.ttf", "arial.ttf", "verdana.ttf"):
            try:
                font = ImageFont.truetype(name, size)
                break
            except Exception:
                continue
        if font is None:
            font = ImageFont.load_default()
        pil = Image.fromarray(img[..., ::-1])
        draw = ImageDraw.Draw(pil)
        rgb = (color[2], color[1], color[0])
        draw.text((pos[0] + 1, pos[1] + 1), text, font=font, fill=(0, 0, 0))
        draw.text(pos, text, font=font, fill=rgb)
        img[:] = np.asarray(pil)[..., ::-1]
    except Exception:
        import cv2

        cv2.putText(img, text, pos, cv2.FONT_HERSHEY_COMPLEX, 0.5, color, 1)
    return img


def analyze_for_navigation(
    image_bgr: np.ndarray,
    detections: List[dict],
    start_point: Optional[Tuple[int, int]] = None,
    grid_scale: int = 4,
    dilate_size: int = 15,
    debug_dir: Optional[str] = None,
) -> np.ndarray:
    """Build the navigation map overlay. Returns the rendered BGR image.
    debug_dir receives debug_texture_mask.jpg (the reference dumps it
    unconditionally into cwd, main.py:1213)."""
    import cv2

    h, w = image_bgr.shape[:2]
    out = image_bgr.copy()
    weights, nav_blocked = build_obstacle_masks(image_bgr, detections, dilate_size)
    nav_mask = nav_blocked.astype(np.uint8)

    if debug_dir:
        import os

        import jax.numpy as jnp

        from rtvm_tpu.navigate.obstacles import color_texture_masks

        _, _, texture = color_texture_masks(jnp.asarray(image_bgr))
        cv2.imwrite(
            os.path.join(debug_dir, "debug_texture_mask.jpg"),
            np.asarray(texture).astype(np.uint8) * 255,
        )

    # red obstacle contours (area gate per reference main.py:1236-1246)
    cnts, _ = cv2.findContours(
        (weights > 0.3).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    for c in cnts:
        a = cv2.contourArea(c)
        if 20 < a < 500000:
            cv2.drawContours(out, [c], -1, (0, 0, 255), 2)

    # start: bottom-center by default (reference main.py:1242)
    start = start_point or (w // 2, h - 30)
    cv2.circle(out, start, 10, (255, 255, 255), -1)
    cv2.circle(out, start, 10, (0, 0, 0), 2)

    # route to each building (reference main.py:1398-1470)
    for d in detections:
        if d.get("class") != "building":
            continue
        x1, y1, x2, y2 = [int(v) for v in d["bbox"]]
        goal = ((x1 + x2) // 2, min(y2 + 10, h - 1))
        if is_path_clear(nav_mask, start, goal):
            cv2.line(out, start, goal, (0, 255, 0), 2)
            continue
        path = find_path_astar(nav_mask, start, goal, scale=grid_scale)
        if path is not None and len(path) >= 2:
            pts = np.asarray(smooth_path(path), np.int32)
            cv2.polylines(out, [pts], False, (0, 255, 0), 2)
        else:
            # one-bend midpoint detour, else dotted direct line (main.py:1472-1495)
            mid = ((start[0] + goal[0]) // 2, max((start[1] + goal[1]) // 2 - 50, 0))
            if is_path_clear(nav_mask, start, mid) and is_path_clear(nav_mask, mid, goal):
                cv2.line(out, start, mid, (0, 255, 0), 2)
                cv2.line(out, mid, goal, (0, 255, 0), 2)
            else:
                draw_dotted_line(out, start, goal, (0, 255, 0), 2)
        _put_text(out, d["class"], (x1, max(y1 - 18, 0)), (0, 255, 255))

    # legend (reference main.py:1248-1330)
    y0 = 24
    for label, colr in LEGEND:
        cv2.rectangle(out, (10, y0 - 12), (26, y0 + 2), colr, -1)
        _put_text(out, label, (32, y0 - 12), (255, 255, 255))
        y0 += 22
    return out
