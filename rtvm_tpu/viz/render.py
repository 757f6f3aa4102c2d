"""Offscreen 3D rendering as a jitted z-buffer splat rasterizer.

TPU-native counterpart of the reference's Open3D offscreen renderer
(reference visualize_pointcloud.py:152-208: OffscreenRenderer 1920x1080 ->
PNG) and the PyVista screenshot backend (visualize_pointcloud.py:252-280).
Open3D/PyVista ship their own C++ rasterizers; here the rasterizer IS the
framework's compute path: project -> splat -> scatter-min z-buffer ->
winner-takes-pixel color pass, all inside one jit so it runs on the chip.

Meshes are rendered as Lambert-shaded surfels: triangles are importance-
sampled by area on the host (cheap, data-dependent counts) and the sample
cloud goes through the same splat kernel with per-sample normals.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


def _lookat(eye: np.ndarray, center: np.ndarray, up: np.ndarray) -> np.ndarray:
    """4x4 world->camera matrix (OpenGL convention: camera looks down -Z)."""
    f = center - eye
    f = f / max(np.linalg.norm(f), 1e-12)
    s = np.cross(f, up)
    s = s / max(np.linalg.norm(s), 1e-12)
    u = np.cross(s, f)
    m = np.eye(4, dtype=np.float32)
    m[0, :3], m[1, :3], m[2, :3] = s, u, -f
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def auto_camera(
    points: np.ndarray,
    direction: Tuple[float, float, float] = (0.35, -0.65, -1.0),
    fov_deg: float = 60.0,
    fill: float = 0.92,
) -> Tuple[np.ndarray, float]:
    """Fit a camera to a cloud like Open3D's default view: look at the
    centroid from `direction`, pulled back so the bounding sphere fills
    `fill` of the vertical FOV. Returns (view_matrix 4x4, focal_scale)."""
    pts = np.asarray(points, np.float32)
    ctr = pts.mean(0)
    radius = max(float(np.linalg.norm(pts - ctr, axis=1).max()), 1e-6)
    d = np.asarray(direction, np.float32)
    d = d / np.linalg.norm(d)
    half = np.deg2rad(fov_deg) / 2
    dist = radius / (fill * np.tan(half))
    eye = ctr - d * dist
    up = np.float32([0, -1, 0]) if abs(d[1]) < 0.95 else np.float32([0, 0, -1])
    return _lookat(eye, ctr, up), 1.0 / np.tan(half)


def _splat_jit():
    import jax
    import jax.numpy as jnp
    from functools import partial

    @partial(jax.jit, static_argnames=("width", "height", "psize"))
    def splat(pts, rgb, view, focal, width, height, psize, bg):
        """Project Nx3 points, splat psize x psize squares, z-buffer resolve.

        pts: [N,3] f32 world; rgb: [N,3] f32 in [0,1]; view: [4,4];
        focal: scalar vertical focal in NDC units; bg: [3] f32.
        Returns [height, width, 3] f32 image.
        """
        n_pix = width * height
        cam = pts @ view[:3, :3].T + view[:3, 3]
        z = -cam[:, 2]  # camera looks down -Z; visible points have z > 0
        zc = jnp.maximum(z, 1e-6)
        # NDC -> pixels (square pixels, vertical FOV sets the scale)
        px = (cam[:, 0] / zc) * focal * (height / 2) + width / 2
        py = -(cam[:, 1] / zc) * focal * (height / 2) + height / 2
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)

        r = psize // 2
        offs = jnp.arange(-r, psize - r)
        oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
        sx = ix[:, None] + ox.reshape(-1)[None, :]  # [N, psize^2]
        sy = iy[:, None] + oy.reshape(-1)[None, :]
        inside = (z > 1e-6)[:, None] & (sx >= 0) & (sx < width) & (sy >= 0) & (sy < height)
        idx = jnp.where(inside, sy * width + sx, n_pix).reshape(-1)
        depth = jnp.broadcast_to(z[:, None], sx.shape).reshape(-1)

        zbuf = jnp.full((n_pix + 1,), jnp.inf, jnp.float32).at[idx].min(depth)
        win = depth <= zbuf[idx] * (1.0 + 1e-6)
        widx = jnp.where(win, idx, n_pix)
        col = jnp.broadcast_to(rgb[:, None, :], (*sx.shape, 3)).reshape(-1, 3)
        img = jnp.tile(bg[None, :], (n_pix + 1, 1)).at[widx].set(col)
        return img[:n_pix].reshape(height, width, 3)

    return splat


_SPLAT = None


def render_points(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    width: int = 1920,
    height: int = 1080,
    point_size: int = 2,
    background=(1.0, 1.0, 1.0),
    view: Optional[np.ndarray] = None,
    focal: Optional[float] = None,
) -> np.ndarray:
    """Render a point cloud offscreen; returns uint8 [height, width, 3] RGB.

    Counterpart of reference visualize_pointcloud.py:152-208 (Open3D
    OffscreenRenderer at 1920x1080). colors: uint8 [N,3] RGB or None
    (z-depth viridis-like ramp, matching the reference's fallback shading).
    """
    global _SPLAT
    import jax.numpy as jnp

    pts = np.ascontiguousarray(points, np.float32).reshape(-1, 3)
    if len(pts) == 0:
        bg = np.clip(np.asarray(background, np.float32) * 255.0, 0, 255)
        return np.broadcast_to(bg.astype(np.uint8), (height, width, 3)).copy()
    if view is None or focal is None:
        view, focal = auto_camera(pts)
    if colors is None:
        zn = pts[:, 2]
        t = (zn - zn.min()) / max(float(np.ptp(zn)), 1e-6)
        colors = np.stack([0.2 + 0.7 * t, 0.1 + 0.8 * (1 - np.abs(t - 0.5) * 2), 0.9 - 0.7 * t], 1)
    else:
        colors = np.asarray(colors)
        # integer dtype = 0..255 channel values; float = already-normalized
        colors = (colors / 255.0 if np.issubdtype(colors.dtype, np.integer)
                  else colors).astype(np.float32)
    if _SPLAT is None:
        _SPLAT = _splat_jit()
    img = _SPLAT(
        jnp.asarray(pts), jnp.asarray(colors.astype(np.float32)),
        jnp.asarray(view), jnp.float32(focal), width, height,
        int(point_size), jnp.asarray(background, jnp.float32),
    )
    return np.asarray(np.clip(np.asarray(img) * 255.0, 0, 255), np.uint8)


def sample_mesh_surfels(
    vertices: np.ndarray,
    faces: np.ndarray,
    budget: int = 1_500_000,
    vertex_colors: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Area-proportional surface samples: (points [M,3], normals [M,3],
    albedo [M,3] in [0,1]). Host-side (data-dependent counts)."""
    v = np.asarray(vertices, np.float32)
    f = np.asarray(faces, np.int64)
    a, b, c = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    cross = np.cross(b - a, c - a)
    area = 0.5 * np.linalg.norm(cross, axis=1)
    normals = cross / np.maximum(np.linalg.norm(cross, axis=1, keepdims=True), 1e-12)
    total = max(float(area.sum()), 1e-12)
    rng = np.random.RandomState(seed)
    counts = np.maximum(1, np.round(area / total * budget).astype(np.int64))
    fidx = np.repeat(np.arange(len(f)), counts)
    m = len(fidx)
    r1, r2 = rng.rand(m, 1).astype(np.float32), rng.rand(m, 1).astype(np.float32)
    s = np.sqrt(r1)
    w0, w1, w2 = 1 - s, s * (1 - r2), s * r2
    pts = w0 * a[fidx] + w1 * b[fidx] + w2 * c[fidx]
    if vertex_colors is not None:
        vc = np.asarray(vertex_colors)
        vc = (vc / 255.0 if np.issubdtype(vc.dtype, np.integer) else vc).astype(np.float32)
        albedo = (w0 * vc[f[fidx, 0]] + w1 * vc[f[fidx, 1]] + w2 * vc[f[fidx, 2]])
    else:
        albedo = np.full((m, 3), 0.62, np.float32)  # reference paints gray
    return pts, normals[fidx], albedo


def render_mesh(
    vertices: np.ndarray,
    faces: np.ndarray,
    vertex_colors: Optional[np.ndarray] = None,
    width: int = 1920,
    height: int = 1080,
    background=(1.0, 1.0, 1.0),
    budget: int = 1_500_000,
) -> np.ndarray:
    """Lambert-shaded offscreen mesh render; returns uint8 RGB image.

    Counterpart of the reference's Open3D offscreen mesh path and PyVista
    screenshot (visualize_pointcloud.py:152-208, 252-280)."""
    pts, normals, albedo = sample_mesh_surfels(vertices, faces, budget, vertex_colors)
    view, focal = auto_camera(pts)
    # headlight Lambert: light along the camera forward axis
    ldir = -view[2, :3]  # world-space camera forward
    lam = np.clip(normals @ ldir.astype(np.float32), 0, None)
    # two-sided: back-facing surfels lit from the front too (thin shells)
    lam = np.maximum(lam, np.clip(normals @ (-ldir.astype(np.float32)), 0, None))
    shade = (0.35 + 0.65 * lam)[:, None] * albedo
    return render_points(pts, shade, width, height, point_size=2,
                         background=background, view=view, focal=focal)


def render_offscreen(path: str, save_path: Optional[str] = None,
                     width: int = 1920, height: int = 1080) -> str:
    """Load a .ply/.obj and write a rasterized PNG at width x height —
    drop-in role of reference visualize_pointcloud.py:152-208."""
    from rtvm_tpu.io.ply import read_obj_mesh, read_ply_points

    if path.endswith(".obj"):
        v, f = read_obj_mesh(path)
        img = render_mesh(v, f, width=width, height=height)
    else:
        pts, cols = read_ply_points(path)
        img = render_points(pts, cols, width=width, height=height)
    out = save_path or os.path.splitext(path)[0] + "_render.png"
    written = False
    try:
        import cv2

        # imwrite signals failure by returning False, not raising
        written = bool(cv2.imwrite(out, img[..., ::-1]))
    except Exception:
        written = False
    if not written:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(out, img)
    return out
