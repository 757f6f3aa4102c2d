"""Unit tests for color conversion and filtering ops against OpenCV oracles."""

import cv2
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import color, filters


def test_bgr2gray_matches_cv2(textured_image):
    ours = np.asarray(color.bgr2gray(jnp.asarray(textured_image)))
    ref = cv2.cvtColor(textured_image, cv2.COLOR_BGR2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() < 1.0  # rounding differences only


def test_bgr2hsv_close_to_cv2(textured_image):
    ours = np.asarray(color.bgr2hsv(jnp.asarray(textured_image)))
    ref = cv2.cvtColor(textured_image, cv2.COLOR_BGR2HSV).astype(np.float32)
    # hue wraps at 180 — compare circularly
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180.0 - dh)
    assert np.percentile(dh, 99) < 2.0
    assert np.abs(ours[..., 1:] - ref[..., 1:]).max() < 3.0


def test_gaussian_blur_matches_cv2(textured_image):
    gray = cv2.cvtColor(textured_image, cv2.COLOR_BGR2GRAY).astype(np.float32)
    sigma = 2.0
    ours = np.asarray(filters.gaussian_blur(jnp.asarray(gray), sigma))
    k = filters.gaussian_kernel1d(sigma).shape[0]
    ref = cv2.GaussianBlur(gray, (k, k), sigma)
    inner = (slice(10, -10), slice(10, -10))  # border handling differs
    assert np.abs(ours[inner] - ref[inner]).max() < 0.5


def test_sobel_matches_cv2(textured_image):
    gray = cv2.cvtColor(textured_image, cv2.COLOR_BGR2GRAY).astype(np.float32)
    gx, gy = filters.sobel(jnp.asarray(gray))
    rx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    ry = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    inner = (slice(2, -2), slice(2, -2))
    assert np.abs(np.asarray(gx)[inner] - rx[inner]).max() < 1e-2
    assert np.abs(np.asarray(gy)[inner] - ry[inner]).max() < 1e-2


def test_morphology_roundtrip(rng):
    mask = (rng.rand(64, 64) > 0.7).astype(np.float32)
    d = np.asarray(filters.dilate(jnp.asarray(mask), 3))
    e = np.asarray(filters.erode(jnp.asarray(mask), 3))
    ref_d = cv2.dilate(mask, np.ones((3, 3), np.uint8))
    ref_e = cv2.erode(mask, np.ones((3, 3), np.uint8))
    assert (d == ref_d).all()
    assert (e == ref_e).all()


def test_stage_timer_chrome_trace(tmp_path):
    """StageTimer records spans and exports a valid Chrome trace-event JSON
    (the host-side tracing path; jax.profiler is tunnel-lethal — SURVEY §5)."""
    import json
    import time as _time

    from rtvm_tpu.utils.timing import StageTimer

    t = StageTimer()
    for _ in range(3):
        with t.stage("window"):
            _time.sleep(0.001)
    with t.stage("detect"):
        pass
    assert t.counts["window"] == 3 and t.counts["detect"] == 1
    assert len(t.spans) == 4
    assert "window" in t.report()

    out = t.write_chrome_trace(str(tmp_path / "trace.json"))
    with open(out) as f:
        doc = json.load(f)
    evs = [e for e in doc["traceEvents"] if e.get("ph") == "X"]
    assert len(evs) == 4
    assert all(e["dur"] >= 0 and "ts" in e for e in evs)
    assert {e["name"] for e in evs} == {"window", "detect"}
