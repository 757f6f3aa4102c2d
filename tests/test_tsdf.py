"""Volumetric reconstruction tests: marching tetrahedra + indicator meshing + TSDF
fusion must recover closed geometry (sphere/box) that the round-1 heightfield mesher
could not represent (VERDICT item 4; reference depth_to_3d.py:377-422, 996-1175)."""

import numpy as np
import pytest

from rtvm_tpu.depth3d.tsdf import (
    fuse_tsdf,
    indicator_mesh_from_points,
    make_tsdf,
    marching_tetrahedra,
    tsdf_mesh,
)


def _edge_counts(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    return counts


def _euler(verts, faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    n_edges = len(np.unique(e, axis=0))
    used = np.unique(faces)
    return len(used) - n_edges + len(faces)


def test_marching_tetrahedra_sphere_sdf():
    # Analytic SDF of a sphere: extracted surface must sit on the sphere.
    n = 48
    ax = np.linspace(-1.2, 1.2, n).astype(np.float32)
    X, Y, Z = np.meshgrid(ax, ax, ax, indexing="ij")
    sdf = np.sqrt(X**2 + Y**2 + Z**2) - 0.8
    voxel = float(ax[1] - ax[0])
    verts, faces = marching_tetrahedra(sdf, 0.0, (ax[0], ax[0], ax[0]), voxel)
    assert len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    assert abs(float(r.mean()) - 0.8) < 0.01
    assert float(np.abs(r - 0.8).max()) < voxel
    # Watertight: every edge borders exactly two triangles; Euler characteristic 2.
    counts = _edge_counts(faces)
    assert (counts == 2).all()
    assert _euler(verts, faces) == 2


def test_indicator_mesh_sphere_cloud():
    # Unorganized surface samples of a sphere -> closed mesh with correct radius.
    rng = np.random.RandomState(0)
    v = rng.randn(20000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v * 1.0
    cols = np.full((len(pts), 3), 200, np.uint8)
    verts, faces, vcols = indicator_mesh_from_points(pts, cols, grid=80)
    assert len(faces) > 1000
    counts = _edge_counts(counts_faces := faces)
    assert (counts == 2).all()
    assert _euler(verts, counts_faces) == 2
    r = np.linalg.norm(verts - verts.mean(0), axis=1)
    # Indicator smoothing dilates/erodes by at most ~2 voxels (~0.03 world units).
    assert abs(float(np.median(r)) - 1.0) < 0.12
    assert vcols is not None and vcols.shape == (len(verts), 3)
    assert (np.abs(vcols.astype(int) - 200) < 30).all()


def test_indicator_mesh_box_cloud():
    rng = np.random.RandomState(1)
    # Samples on the surface of a 2 x 1 x 0.6 box.
    n = 6000
    pts = []
    for axis in range(3):
        dims = [2.0, 1.0, 0.6]
        for side in (0.0, dims[axis]):
            p = rng.rand(n // 6, 3) * dims
            p[:, axis] = side
            pts.append(p)
    pts = np.concatenate(pts)
    verts, faces, _ = indicator_mesh_from_points(pts, grid=72)
    assert len(faces) > 500
    assert (_edge_counts(faces) == 2).all()
    mn, mx = verts.min(0), verts.max(0)
    np.testing.assert_allclose(mx - mn, [2.0, 1.0, 0.6], atol=0.15)


def test_heightfield_would_fail_closed_shape():
    # The round-1 mesher rasterizes along -z: for a closed sphere it collapses the
    # bottom hemisphere. Documents WHY the volumetric path exists.
    from rtvm_tpu.depth3d.mesh import heightfield_mesh_from_points

    rng = np.random.RandomState(2)
    v = rng.randn(8000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    verts_h, faces_h, _ = heightfield_mesh_from_points(v, grid=48)
    # The heightfield spans only the upper surface: its z-extent misses the full
    # diameter whereas the indicator mesh covers it.
    assert verts_h[:, 2].max() - verts_h[:, 2].min() < 2.2  # sanity: it runs
    counts = _edge_counts(faces_h)
    assert (counts == 1).any()  # open boundary edges -> not watertight


def test_surface_mesh_dispatcher():
    from rtvm_tpu.depth3d.mesh import cloud_is_heightfield, surface_mesh_from_points

    rng = np.random.RandomState(3)
    # Terrain-like: z = f(x, y) plus noise -> heightfield route.
    xy = rng.rand(5000, 2) * 4
    terrain = np.column_stack([xy, 0.3 * np.sin(xy[:, 0]) + 0.01 * rng.randn(5000)])
    assert cloud_is_heightfield(terrain)
    # Closed sphere -> volumetric route.
    v = rng.randn(5000, 3)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    assert not cloud_is_heightfield(v)
    verts, faces, _ = surface_mesh_from_points(v, grid=64)
    assert (_edge_counts(faces) == 2).all()


def test_tsdf_fusion_sphere_depths():
    # Render analytic depth maps of a unit sphere from 4 cameras on a circle,
    # fuse, and check the extracted surface radius.
    n_img, f = 96, 120.0
    K = np.array([[f, 0, n_img / 2], [0, f, n_img / 2], [0, 0, 1]], np.float32)
    r_cam, R = 3.0, 0.8

    def look_at_pose(angle):
        # Camera at angle on the xy-circle, looking at the origin, z forward.
        eye = np.array([r_cam * np.cos(angle), r_cam * np.sin(angle), 0.0])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        true_up = np.cross(right, fwd)
        T = np.eye(4, dtype=np.float32)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, -true_up, fwd, eye
        return T

    def render_depth(T):
        # Ray-march-free analytic ray-sphere intersection.
        u, v = np.meshgrid(np.arange(n_img), np.arange(n_img))
        d_cam = np.stack(
            [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u, np.float32)], -1
        )
        d_world = d_cam @ T[:3, :3].T
        o = T[:3, 3]
        b = (d_world * o).sum(-1)
        a = (d_world * d_world).sum(-1)
        c = (o * o).sum() - R * R
        disc = b * b - a * c
        t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0))) / a, -1.0)
        z = t * d_cam[..., 2] * np.linalg.norm(d_world, axis=-1) / np.linalg.norm(
            d_world, axis=-1
        )
        depth = np.where(t > 0, t, 0.0).astype(np.float32)
        # depth here is distance along the ray; convert to z-depth in camera frame
        pt_cam = d_cam * depth[..., None]
        return np.where(depth > 0, pt_cam[..., 2], 0.0).astype(np.float32)

    poses = np.stack([look_at_pose(a) for a in np.linspace(0, 2 * np.pi, 5)[:-1]])
    depths = np.stack([render_depth(T) for T in poses])
    assert (depths > 0).mean() > 0.005

    vol = make_tsdf(origin=(-1.2, -1.2, -1.2), size=2.4, grid=72)
    vol = fuse_tsdf(vol, depths, K, poses)
    verts, faces = tsdf_mesh(vol)
    assert len(faces) > 300
    r = np.linalg.norm(verts, axis=1)
    assert abs(float(np.median(r)) - R) < 0.08
