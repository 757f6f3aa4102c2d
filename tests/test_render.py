"""Offscreen z-buffer splat renderer (viz/render.py) — counterpart of the
reference's Open3D offscreen / PyVista backends (visualize_pointcloud.py:
152-208, 252-280)."""

import numpy as np
import pytest

from rtvm_tpu.viz.render import (
    auto_camera,
    render_mesh,
    render_offscreen,
    render_points,
    sample_mesh_surfels,
)


def _cube_cloud(n=4000, seed=0):
    rng = np.random.RandomState(seed)
    pts = rng.rand(n, 3).astype(np.float32) * 2 - 1
    cols = ((pts + 1) / 2 * 255).astype(np.uint8)
    return pts, cols


def test_points_render_coverage_and_size():
    pts, cols = _cube_cloud()
    img = render_points(pts, cols, width=320, height=200, point_size=2)
    assert img.shape == (200, 320, 3) and img.dtype == np.uint8
    nonbg = (img != 255).any(axis=2).mean()
    assert 0.05 < nonbg < 0.95  # cloud visible, not a wall of paint


def test_z_buffer_nearer_point_wins():
    # two points on the optical axis; the camera fit looks at their centroid
    pts = np.float32([[0, 0, 0], [0, 0, 1]])
    # direction (0,0,-1): eye = centroid + Z offset, looking down -Z, so the
    # z=1 point (green) is nearer than the z=0 one (red)
    view, focal = auto_camera(pts, direction=(0, 0, -1))
    cols = np.float32([[1, 0, 0], [0, 1, 0]])
    img = render_points(pts, cols, width=64, height=64, point_size=3,
                        view=view, focal=focal)
    center = img[30:34, 30:34].reshape(-1, 3)
    hit = center[(center != 255).any(1)]
    assert len(hit) > 0
    assert (hit[:, 1] > 200).all() and (hit[:, 0] < 50).all()  # green won


def test_points_behind_camera_culled():
    pts = np.float32([[0, 0, 0], [0, 0, 1]])
    view, focal = auto_camera(pts, direction=(0, 0, -1))
    # the camera sits at z ~ +1.5 looking down -Z; z=+100 is behind it
    pts2 = np.float32([[0, 0, 0], [0, 0, 100]])
    img = render_points(pts2, np.float32([[1, 0, 0], [0, 1, 0]]),
                        width=64, height=64, point_size=3, view=view, focal=focal)
    assert not ((img[..., 1] > 200) & (img[..., 0] < 50)).any()  # no green


def test_mesh_surfel_sampling_area_proportional():
    v = np.float32([[0, 0, 0], [1, 0, 0], [0, 1, 0], [10, 0, 1], [11, 0, 1], [10, 4, 1]])
    f = np.int64([[0, 1, 2], [3, 4, 5]])  # areas 0.5 and 2.0
    pts, normals, albedo = sample_mesh_surfels(v, f, budget=10000)
    near_big = (pts[:, 0] > 5).sum()
    assert near_big / len(pts) == pytest.approx(0.8, abs=0.05)
    assert np.allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-5)
    assert albedo.min() >= 0 and albedo.max() <= 1


def test_mesh_render_shaded():
    # a coarse sphere: shading must vary across the surface (Lambert works)
    th = np.linspace(0, np.pi, 24)
    ph = np.linspace(0, 2 * np.pi, 48)
    T, P = np.meshgrid(th, ph, indexing="ij")
    v = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1)
    v = v.reshape(-1, 3).astype(np.float32)
    idx = np.arange(24 * 48).reshape(24, 48)
    f = []
    for i in range(23):
        for j in range(47):
            f.append([idx[i, j], idx[i + 1, j], idx[i, j + 1]])
            f.append([idx[i + 1, j], idx[i + 1, j + 1], idx[i, j + 1]])
    img = render_mesh(v, np.int64(f), width=160, height=120, budget=200000)
    mask = (img != 255).any(axis=2)
    assert mask.mean() > 0.1
    vals = img[mask].astype(np.float32).mean(axis=1)
    assert vals.std() > 10  # shading gradient, not flat paint


def test_render_offscreen_writes_png(tmp_path):
    from rtvm_tpu.io.ply import write_ply_points

    pts, cols = _cube_cloud(800)
    p = str(tmp_path / "cloud.ply")
    write_ply_points(p, pts, cols)
    out = render_offscreen(p, width=256, height=144)
    import cv2

    img = cv2.imread(out)
    assert img is not None and img.shape == (144, 256, 3)
