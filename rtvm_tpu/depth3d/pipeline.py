"""Depth-to-3D pipelines (reference depth_to_3d.py:542-1175 and
image_terrain_reconstruction.py:59-517):

- process_video_to_3d_model: sampled frames -> depth -> clouds -> ICP fusion ->
  filtered/voxelized cloud + mesh (D4);
- process_single_image: one frame -> cloud + mesh + depth visualization (D5);
- process_multiple_images_to_3d: multi-view fusion with ORB-based camera-angle
  estimation (D6);
- ImageTerrainReconstructor: single-image terrain pipeline with bilateral
  preprocessing and matplotlib/PLY/OBJ outputs (D8).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from rtvm_tpu.depth3d.estimator import MonocularDepthEstimator
from rtvm_tpu.depth3d.icp import register_clouds
from rtvm_tpu.depth3d.mesh import depth_grid_mesh, surface_mesh_from_points
from rtvm_tpu.depth3d.pointcloud import (
    remove_statistical_outliers,
    rotate_points,
    unproject_depth,
    voxel_downsample,
)
from rtvm_tpu.io.ply import write_obj_mesh, write_ply_mesh, write_ply_points


def process_video_to_3d_model(
    video_path: str,
    output_dir: Optional[str] = None,
    model: str = "depth-anything-small",
    frame_step: int = 30,
    max_frames: int = 8,
    single_frame: bool = False,
    icp_threshold: float = 0.5,
    icp_fitness_accept: float = 0.3,
    voxel: float = 0.02,
):
    """Video -> fused point cloud (.ply) + mesh (.obj/.ply). Frames whose ICP
    fitness is below the accept gate are dropped (reference depth_to_3d.py:658-665)."""
    est = MonocularDepthEstimator(model)
    base = os.path.splitext(os.path.basename(video_path))[0]
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)

    samples = list(est.estimate_depth_video(video_path, frame_step, 1 if single_frame else max_frames))
    if not samples:
        raise ValueError(f"no frames decoded from {video_path}")

    merged_pts, merged_cols = None, None
    kept = 0
    for i, (frame, depth) in enumerate(samples):
        pts, cols = unproject_depth(depth, frame, stride=3)
        if merged_pts is None:
            merged_pts, merged_cols = pts, cols
            kept += 1
            continue
        res = register_clouds(pts, merged_pts, threshold=icp_threshold)
        if float(res.fitness) < icp_fitness_accept:
            print(f"Кадр {i}: ICP fitness {float(res.fitness):.2f} < {icp_fitness_accept}, пропуск")
            continue
        R = np.asarray(res.R)
        t = np.asarray(res.t)
        merged_pts = np.concatenate([merged_pts, pts @ R.T + t], axis=0)
        merged_cols = np.concatenate([merged_cols, cols], axis=0)
        kept += 1

    merged_pts, merged_cols, _ = remove_statistical_outliers(merged_pts, 20, 2.0, merged_cols)
    merged_pts, merged_cols = voxel_downsample(merged_pts, voxel, merged_cols)

    cloud_path = os.path.join(out_dir, f"{base}_pointcloud.ply")
    write_ply_points(cloud_path, merged_pts, merged_cols)

    verts, faces, vcols = surface_mesh_from_points(merged_pts, merged_cols)
    verts = rotate_points(verts, "x", np.pi)  # reference flips the mesh upright
    mesh_obj = os.path.join(out_dir, f"{base}_mesh.obj")
    mesh_ply = os.path.join(out_dir, f"{base}_mesh.ply")
    write_obj_mesh(mesh_obj, verts, faces)
    write_ply_mesh(mesh_ply, verts, faces, vcols)
    print(f"Сохранено: {cloud_path} ({len(merged_pts)} точек), {mesh_obj} ({len(faces)} граней); "
          f"использовано кадров: {kept}/{len(samples)}")
    return {"cloud": cloud_path, "mesh_obj": mesh_obj, "mesh_ply": mesh_ply,
            "points": merged_pts, "colors": merged_cols, "frames_used": kept}


def process_single_image(
    image_path: str,
    output_dir: Optional[str] = None,
    model: str = "depth-anything-small",
    depth_scale: float = 5.0,
):
    """Image -> cloud + mesh + 3-panel depth visualization (reference
    depth_to_3d.py:760-841)."""
    import cv2

    img = cv2.imread(image_path)
    if img is None:
        raise FileNotFoundError(image_path)
    est = MonocularDepthEstimator(model)
    depth = est.estimate_depth(img)
    base = os.path.splitext(os.path.basename(image_path))[0]
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)

    pts, cols = unproject_depth(depth, img, depth_scale=depth_scale, stride=2)
    pts, cols, _ = remove_statistical_outliers(pts, 20, 2.0, cols)
    cloud_path = os.path.join(out_dir, f"{base}_pointcloud.ply")
    write_ply_points(cloud_path, pts, cols)

    verts, faces, vcols = depth_grid_mesh(depth, img, depth_scale=depth_scale)
    mesh_path = os.path.join(out_dir, f"{base}_mesh.obj")
    write_obj_mesh(mesh_path, verts, faces)

    vis_path = os.path.join(out_dir, f"{base}_depth_visualization.png")
    _save_depth_panels(img, depth, vis_path)
    return {"cloud": cloud_path, "mesh": mesh_path, "visualization": vis_path,
            "points": pts, "depth": depth}


def _save_depth_panels(img_bgr: np.ndarray, depth: np.ndarray, path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(14, 4.5))
    axes[0].imshow(img_bgr[..., ::-1]); axes[0].set_title("изображение")
    im1 = axes[1].imshow(depth, cmap="plasma"); axes[1].set_title("глубина")
    fig.colorbar(im1, ax=axes[1], fraction=0.046)
    axes[2].imshow(img_bgr[..., ::-1]); axes[2].imshow(depth, cmap="plasma", alpha=0.55)
    axes[2].set_title("наложение")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def estimate_camera_angles_from_images(images: List[np.ndarray], fov_deg: float = 60.0) -> List[float]:
    """Heuristic yaw angles from consecutive ORB match displacement mapped through the
    FOV, cumulative and renormalized toward 360 (reference depth_to_3d.py:844-934)."""
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.ops import color
    from rtvm_tpu.ops.features import fast as fast_ops, orb as orb_ops
    from rtvm_tpu.ops import match as match_ops

    angles = [0.0]
    feats = []
    for img in images:
        g = color.bgr2gray(jnp.asarray(img))
        kp = fast_ops.detect_fast(g, 300, 20.0, 16, 9)
        de = orb_ops.describe_orb(g, kp)
        feats.append((kp, de))
    for i in range(1, len(images)):
        kp0, d0 = feats[i - 1]
        kp1, d1 = feats[i]
        m = match_ops.match_hamming_crosscheck(d1.bits, d1.valid, d0.bits, d0.valid)
        src, dst, valid = match_ops.gather_correspondences(kp1.xy, kp0.xy, m)
        v = np.asarray(valid)
        if v.sum() < 8:
            delta = 360.0 / len(images)
        else:
            dx = float(np.median(np.asarray(dst - src)[v][:, 0]))
            w = images[i].shape[1]
            delta = float(np.clip(dx / w * fov_deg, -90.0, 90.0))
        angles.append(angles[-1] + delta)
    total = angles[-1] if abs(angles[-1]) > 1e-6 else 360.0
    return [a * 360.0 / total for a in angles]


def process_multiple_images_to_3d(
    image_paths: List[str],
    output_dir: Optional[str] = None,
    model: str = "depth-anything-small",
    angle_mode: str = "auto",
    manual_angles: Optional[List[float]] = None,
    voxel: float = 0.02,
):
    """Multi-view fusion: per-image clouds rotated by estimated yaw, merged,
    filtered, meshed (reference depth_to_3d.py:936-1175)."""
    import cv2

    images = [cv2.imread(p) for p in image_paths]
    images = [im for im in images if im is not None]
    if not images:
        raise ValueError("no readable images")
    if angle_mode == "manual" and manual_angles:
        angles = manual_angles
    elif angle_mode == "uniform":
        angles = [i * 360.0 / len(images) for i in range(len(images))]
    else:
        angles = estimate_camera_angles_from_images(images)

    est = MonocularDepthEstimator(model)
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)

    all_pts, all_cols = [], []
    for img, ang in zip(images, angles):
        depth = est.estimate_depth(img)
        pts, cols = unproject_depth(depth, img, stride=3)
        pts, cols, _ = remove_statistical_outliers(pts, 16, 2.5, cols)
        pts, cols = voxel_downsample(pts, 0.03, cols)
        pts = rotate_points(pts, "y", np.deg2rad(ang))
        all_pts.append(pts)
        all_cols.append(cols)
    merged = np.concatenate(all_pts, 0)
    mcols = np.concatenate(all_cols, 0)
    merged, mcols, _ = remove_statistical_outliers(merged, 20, 2.0, mcols)
    merged, mcols = voxel_downsample(merged, voxel, mcols)

    cloud_path = os.path.join(out_dir, "multi_view_pointcloud.ply")
    write_ply_points(cloud_path, merged, mcols)
    # 360-degree fusion clouds are not heightfields: volumetric reconstruction
    # (smoothed-indicator level set, the Poisson stand-in) unless auto detects a
    # flat scan.
    verts, faces, vcols = surface_mesh_from_points(merged, mcols)
    write_obj_mesh(os.path.join(out_dir, "multi_view_mesh.obj"), verts, faces)
    write_ply_mesh(os.path.join(out_dir, "multi_view_mesh.ply"), verts, faces, vcols)
    return {"cloud": cloud_path, "points": merged, "angles": angles}


class ImageTerrainReconstructor:
    """Single-image terrain 3D reconstruction (reference
    image_terrain_reconstruction.py:59-517): depth -> bilateral+median smoothing ->
    dense cloud -> mesh -> saved artifacts."""

    def __init__(self, model: str = "depth-anything-small", depth_scale: float = 10.0,
                 fast: bool = False):
        self.est = MonocularDepthEstimator(model)
        self.depth_scale = depth_scale
        self.fast = fast

    def process(self, image_path: str, output_dir: Optional[str] = None, visualize: bool = False):
        import cv2

        img = cv2.imread(image_path)
        if img is None:
            raise FileNotFoundError(image_path)
        base = os.path.splitext(os.path.basename(image_path))[0]
        out_dir = output_dir or "."
        os.makedirs(out_dir, exist_ok=True)

        depth = self.est.estimate_depth(img)
        # preprocessing parity: bilateral smoothing + median hole-fill
        # (image_terrain_reconstruction.py:171-183)
        d8 = (depth * 255).astype(np.uint8)
        d8 = cv2.bilateralFilter(d8, 5, 50, 50)
        d8 = cv2.medianBlur(d8, 5)
        depth = d8.astype(np.float32) / 255.0

        stride = 3 if self.fast else 1
        pts, cols = unproject_depth(depth, img, depth_scale=self.depth_scale, stride=stride)
        pts, cols, _ = remove_statistical_outliers(pts, 20, 3.0, cols)
        pts_v, cols_v = voxel_downsample(pts, 0.02, cols)

        depth_png = os.path.join(out_dir, f"{base}_depth.png")
        cv2.imwrite(depth_png, cv2.applyColorMap((depth * 255).astype(np.uint8), cv2.COLORMAP_PLASMA))
        cloud_path = os.path.join(out_dir, f"{base}_pointcloud.ply")
        write_ply_points(cloud_path, pts_v, cols_v)
        verts, faces, _ = depth_grid_mesh(depth, img, depth_scale=self.depth_scale,
                                          stride=2 if self.fast else 1)
        mesh_path = os.path.join(out_dir, f"{base}_mesh.obj")
        write_obj_mesh(mesh_path, verts, faces)
        if visualize:
            _save_depth_panels(img, depth, os.path.join(out_dir, f"{base}_panels.png"))
        return {"depth": depth_png, "cloud": cloud_path, "mesh": mesh_path,
                "num_points": len(pts_v), "num_faces": len(faces)}
