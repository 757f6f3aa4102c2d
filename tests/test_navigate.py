"""Navigation stack tests: obstacle masks, occupancy grid, A*, map rendering."""

import numpy as np

from rtvm_tpu.navigate import astar as A
from rtvm_tpu.navigate.mapping import analyze_for_navigation
from rtvm_tpu.navigate.obstacles import build_obstacle_masks, detection_obstacle_mask


def test_detection_obstacle_mask_weights():
    dets = [
        {"bbox": [40, 40, 60, 60], "class": "fire", "confidence": 0.9},
        {"bbox": [120, 40, 140, 60], "class": "car", "confidence": 0.9},
    ]
    m = detection_obstacle_mask((200, 200), dets)
    assert m[50, 50] == 1.0  # danger weight
    assert abs(m[50, 130] - 0.9) < 1e-6  # vehicle weight
    assert m[50, 78] > 0  # fire buffer extends beyond the box (>= 40*0.5 px)
    assert m[5, 195] == 0.0


def test_occupancy_grid_blocking():
    mask = np.zeros((40, 40), np.float32)
    mask[:, 18:22] = 1.0  # vertical wall
    grid = A.occupancy_grid(mask, scale=4, blocked_fraction=0.3)
    assert grid.shape == (10, 10)
    assert grid[:, 4].all() or grid[:, 5].all()


def test_astar_routes_around_wall():
    mask = np.zeros((100, 100), np.float32)
    mask[20:80, 45:55] = 1.0  # wall with gaps at top/bottom
    path = A.find_path_astar(mask, (10, 50), (90, 50), scale=4)
    assert path is not None
    pts = np.asarray(path)
    # path must avoid the wall cells
    for x, y in pts:
        assert not mask[min(y, 99), min(x, 99)] > 0
    sm = A.smooth_path(path)
    assert len(sm) >= 2


def test_astar_blocked_returns_none():
    mask = np.zeros((64, 64), np.float32)
    mask[28:36, :] = 1.0  # full-width wall
    assert A.find_path_astar(mask, (32, 5), (32, 60), scale=4) is None


def test_is_path_clear():
    mask = np.zeros((50, 50), np.float32)
    assert A.is_path_clear(mask, (0, 0), (49, 49))
    mask[20:30, 20:30] = 1.0
    assert not A.is_path_clear(mask, (0, 0), (49, 49))
    assert A.is_path_clear(mask, (0, 40), (40, 49)) in (True, False)


def test_analyze_for_navigation_renders(textured_image):
    dets = [
        {"bbox": [60, 40, 140, 110], "class": "building", "confidence": 0.8},
        {"bbox": [200, 150, 230, 175], "class": "car", "confidence": 0.7},
    ]
    out = analyze_for_navigation(textured_image, dets)
    assert out.shape == textured_image.shape
    # something was drawn (image differs from input)
    assert (out != textured_image).any()


def test_build_obstacle_masks_shapes(textured_image):
    w, nav = build_obstacle_masks(textured_image, [])
    assert w.shape == textured_image.shape[:2]
    assert nav.dtype == bool
