"""Cheap host-side motion pre-scan: size the mosaic canvas BEFORE stitching.

The reference preallocates a fixed canvas (main.py:80-81) that fast pans warp
out of; our reactive auto-grow (stitcher._maybe_grow) fixes that for the
windowed path but forces per-window host decisions, which keeps the 1080p
streaming config off the fused clip path (VERDICT r3 item 9). This pre-scan
chains homographies over strided frames with OpenCV ORB (host-side by design,
like calibration — the hot path stays on-device) and returns the exact canvas
size + seed offset that contains every warped frame, so the fused
`process_clip` dispatches can run growth-free.
"""

from __future__ import annotations

import math
from typing import Iterable, Optional, Tuple

import numpy as np


def _corners(h: int, w: int) -> np.ndarray:
    return np.array(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], dtype=np.float64
    )


def prescan_extent(
    frames: Iterable[np.ndarray],
    stride: int = 8,
    max_keypoints: int = 500,
) -> Optional[Tuple[float, float, float, float]]:
    """Chain ORB homographies over every `stride`-th frame and return the
    bounding box (min_x, min_y, max_x, max_y) of all warped frame corners in
    frame-0 pixel coordinates (frame 0's top-left is (0, 0)).

    Returns None when the motion cannot be tracked (too few matches or a
    degenerate homography) — callers should fall back to reactive auto-grow.
    """
    import cv2

    orb = cv2.ORB_create(max_keypoints)
    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)

    it = iter(frames)
    try:
        first = next(it)
    except StopIteration:
        return None
    h, w = first.shape[:2]
    prev_gray = cv2.cvtColor(first, cv2.COLOR_BGR2GRAY)
    kp_prev, des_prev = orb.detectAndCompute(prev_gray, None)

    H = np.eye(3, dtype=np.float64)
    box = _corners(h, w)
    lo = box.min(axis=0)
    hi = box.max(axis=0)

    for i, frame in enumerate(it, start=1):
        if i % stride:
            continue
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        kp, des = orb.detectAndCompute(gray, None)
        if des is None or des_prev is None or len(kp) < 8:
            return None
        matches = bf.match(des, des_prev)
        if len(matches) < 8:
            return None
        src = np.float32([kp[m.queryIdx].pt for m in matches])
        dst = np.float32([kp_prev[m.trainIdx].pt for m in matches])
        H_rel, _ = cv2.findHomography(src, dst, cv2.RANSAC, 3.0)
        if H_rel is None or not np.isfinite(H_rel).all():
            return None
        H = H @ H_rel
        pts = cv2.perspectiveTransform(_corners(h, w)[None], H)[0]
        if not np.isfinite(pts).all() or np.abs(pts).max() > 64 * max(h, w):
            return None  # diverged chain — growth heuristics are safer
        lo = np.minimum(lo, pts.min(axis=0))
        hi = np.maximum(hi, pts.max(axis=0))
        prev_gray, kp_prev, des_prev = gray, kp, des
    return float(lo[0]), float(lo[1]), float(hi[0]), float(hi[1])


def prescan_canvas(
    frames: Iterable[np.ndarray],
    frame_hw: Tuple[int, int],
    stride: int = 8,
    margin: int = 64,
    max_area_times: float = 24.0,
) -> Optional[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Turn a prescan extent into (canvas_hw, seed_offset) for MosaicConfig.

    The canvas is padded by `margin` px on every side (strided scanning skips
    intermediate frames whose footprint can poke slightly past the sampled
    hull) and aligned to TPU-friendly multiples (rows % 8, cols % 128 == 0).
    Returns None when tracking failed or the extent exceeds `max_area_times`
    the frame area (runaway chain — let reactive auto-grow handle it).
    """
    ext = prescan_extent(frames, stride=stride)
    if ext is None:
        return None
    min_x, min_y, max_x, max_y = ext
    h, w = frame_hw
    hc = int(math.ceil(max_y - min_y)) + 2 * margin
    wc = int(math.ceil(max_x - min_x)) + 2 * margin
    hc = max(hc, h + 2)
    wc = max(wc, w + 2)
    if hc * wc > max_area_times * h * w:
        return None
    # TPU tiling alignment: lane dim (cols) to 128, sublane (rows) to 8.
    hc = (hc + 7) // 8 * 8
    wc = (wc + 127) // 128 * 128
    seed = (margin + int(round(-min_y)), margin + int(round(-min_x)))
    return (hc, wc), seed


def prescan_canvas_from_video(
    video_path: str,
    stride: int = 8,
    margin: int = 64,
    max_frames: Optional[int] = None,
) -> Optional[Tuple[Tuple[int, int], Tuple[int, int]]]:
    """Decode-as-you-scan convenience wrapper over prescan_canvas."""
    import cv2

    def gen():
        cap = cv2.VideoCapture(video_path)
        n = 0
        try:
            while max_frames is None or n < max_frames:
                ok, fr = cap.read()
                if not ok:
                    return
                n += 1
                yield fr
        finally:
            cap.release()

    g = gen()
    try:
        first = next(g)
    except StopIteration:
        return None
    hw = first.shape[:2]

    def chain():
        yield first
        yield from g

    return prescan_canvas(chain(), hw, stride=stride, margin=margin)
