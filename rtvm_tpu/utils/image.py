"""Host-side post-processing utilities (behavioral ports of reference main.py:980-1048)."""

from __future__ import annotations

import numpy as np


def crop_black_areas(image: np.ndarray, threshold: int = 15, margin: int = 5) -> np.ndarray:
    """Crop away near-black borders (reference crop_black_areas, main.py:980-1004;
    called with threshold=80, margin=30 at main.py:1649)."""
    gray = image.mean(axis=2) if image.ndim == 3 else image
    mask = gray > threshold
    if not mask.any():
        return image
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    y0 = max(int(rows[0]) - margin, 0)
    y1 = min(int(rows[-1]) + margin + 1, image.shape[0])
    x0 = max(int(cols[0]) - margin, 0)
    x1 = min(int(cols[-1]) + margin + 1, image.shape[1])
    return image[y0:y1, x0:x1]


def get_screen_size() -> tuple[int, int]:
    """Screen size with the reference's non-Windows fallback (main.py:1006-1026)."""
    try:  # pragma: no cover - Windows only
        import ctypes

        user32 = ctypes.windll.user32
        return int(user32.GetSystemMetrics(0)), int(user32.GetSystemMetrics(1))
    except Exception:
        return 1920, 1080


def scale_to_screen(image: np.ndarray, screen: tuple[int, int] | None = None) -> np.ndarray:
    """Aspect-preserving downscale so the image fits the screen (main.py:1006-1040).
    Never upscales."""
    sw, sh = screen if screen is not None else get_screen_size()
    h, w = image.shape[:2]
    scale = min(sw / w, sh / h, 1.0)
    if scale >= 1.0:
        return image
    nw, nh = int(w * scale), int(h * scale)
    try:
        import cv2

        return cv2.resize(image, (nw, nh), interpolation=cv2.INTER_AREA)
    except Exception:
        ys = (np.arange(nh) * h / nh).astype(int)
        xs = (np.arange(nw) * w / nw).astype(int)
        return image[ys][:, xs]


def draw_dotted_line(img: np.ndarray, p1, p2, color, thickness: int = 2, gap: int = 10):
    """Dotted line segment (reference draw_dotted_line, main.py:1042-1048)."""
    import cv2

    p1 = np.asarray(p1, float)
    p2 = np.asarray(p2, float)
    dist = float(np.hypot(*(p2 - p1)))
    n = max(int(dist / gap), 1)
    for i in range(0, n + 1, 2):
        a = p1 + (p2 - p1) * (i / n)
        b = p1 + (p2 - p1) * (min(i + 1, n) / n)
        cv2.line(img, tuple(a.astype(int)), tuple(b.astype(int)), color, thickness)
    return img


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio between two uint8-range images."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
