"""SLAM tests: LK flow on known shifts, essential-matrix pose recovery on synthetic
geometry, VO trajectory on a translating synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvm_tpu.ops import color
from rtvm_tpu.ops.features import fast as fast_ops
from rtvm_tpu.slam.epipolar import find_essential_and_pose
from rtvm_tpu.slam.flow import track_lk
from rtvm_tpu.slam.vo import SimpleSLAM, VisualOdometry, default_camera_matrix


def test_lk_tracks_known_shift(textured_image):
    g = np.asarray(color.bgr2gray(jnp.asarray(textured_image)))
    a = jnp.asarray(g[20:220, 20:320])
    b = jnp.asarray(g[25:225, 28:328])  # content shifted by (-8, -5) in (x, y)
    kps = fast_ops.detect_fast(a, 100, 25.0, 20, 9)
    pts1, valid = track_lk(a, b, kps.xy, kps.valid)
    assert int(valid.sum()) > 20
    d = np.asarray(pts1 - kps.xy)[np.asarray(valid)]
    med = np.median(d, axis=0)
    assert np.abs(med - np.array([-8.0, -5.0])).max() < 0.5


def test_essential_recovers_translation(rng):
    """Synthetic: camera translates along +x; recovered t must point along -x-ish
    (cv2 convention: X2 = R X1 + t with t = -R C2)."""
    K = jnp.asarray(default_camera_matrix(640, 480))
    n = 100
    pts3d = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(4, 10, n)], 1
    )
    C2 = np.array([0.5, 0.0, 0.0])  # camera 2 center
    x1 = pts3d[:, :2] / pts3d[:, 2:3]
    p2 = pts3d - C2
    x2 = p2[:, :2] / p2[:, 2:3]
    Knp = np.asarray(K)
    px1 = x1 * [Knp[0, 0], Knp[1, 1]] + [Knp[0, 2], Knp[1, 2]]
    px2 = x2 * [Knp[0, 0], Knp[1, 1]] + [Knp[0, 2], Knp[1, 2]]
    px1 += rng.randn(n, 2) * 0.3
    px2 += rng.randn(n, 2) * 0.3

    res = find_essential_and_pose(
        jnp.asarray(px1, jnp.float32),
        jnp.asarray(px2, jnp.float32),
        jnp.ones(n, bool),
        K,
        jax.random.PRNGKey(0),
    )
    assert bool(res.ok)
    assert int(res.num_inliers) > 60
    R = np.asarray(res.R)
    t = np.asarray(res.t)
    # R should be near identity
    assert np.abs(R - np.eye(3)).max() < 0.05
    # t (unit) should align with -C2 direction = (-1, 0, 0)
    assert t[0] < -0.95


def test_vo_trajectory_moves_consistently(textured_image):
    import cv2

    scene = cv2.resize(textured_image, (640, 520))
    frames = [scene[i * 4 : i * 4 + 240, 0:320] for i in range(8)]  # pan down
    vo = VisualOdometry(default_camera_matrix(320, 240), max_features=300)
    for f in frames:
        vo.process_frame(np.ascontiguousarray(f))
    traj = np.asarray(vo.trajectory)
    assert len(traj) == len(frames)
    # net motion should be dominated by one consistent direction (y in camera frame)
    net = traj[-1] - traj[0]
    assert np.linalg.norm(net) > 0.5  # moved at all (scale is arbitrary)


def test_simple_slam_keyframes(textured_image):
    import cv2

    scene = cv2.resize(textured_image, (640, 520))
    frames = [scene[i * 6 : i * 6 + 240, 0:320] for i in range(6)]
    slam = SimpleSLAM(default_camera_matrix(320, 240), max_features=300)
    for f in frames:
        slam.process_frame(np.ascontiguousarray(f))
    assert len(slam.keyframes) >= 1
    m = slam.render_map()
    assert m.shape == (400, 400, 3)


def test_runner_saves_trajectory(tmp_path, textured_image):
    import cv2

    # build a tiny temp video
    scene = cv2.resize(textured_image, (640, 520))
    vp = str(tmp_path / "clip.mp4")
    wr = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    for i in range(6):
        wr.write(np.ascontiguousarray(scene[i * 6 : i * 6 + 240, 0:320]))
    wr.release()

    from rtvm_tpu.slam.runner import run_slam_on_video, visualize_trajectory_3d

    slam, traj = run_slam_on_video(vp, output_dir=str(tmp_path / "out"))
    assert (tmp_path / "out" / "slam_trajectory_final.npy").exists()
    assert (tmp_path / "out" / "slam_trajectory_final.txt").exists()
    png = visualize_trajectory_3d(str(tmp_path / "out" / "slam_trajectory_final.npy"))
    assert png.endswith(".png")
