"""Visual odometry + SimpleSLAM — TPU-native rebuild of reference slam.py:24-390.

Pipeline per frame (reference slam.py:126-201): FAST features (ORB 2000) ->
pyramidal LK tracking with forward-backward gate -> essential-matrix RANSAC +
pose recovery -> pose chain T = T @ T_rel; features re-detected when tracked
count collapses (<500 redetect, <8 re-init). All per-frame math runs in jitted
JAX; the pose chain and keyframe policy are host-side (tiny 4x4 algebra).
"""

from __future__ import annotations

import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import color
from rtvm_tpu.ops.features import fast as fast_ops
from rtvm_tpu.ops.features import orb as orb_ops
from rtvm_tpu.slam.epipolar import find_essential_and_pose
from rtvm_tpu.slam.flow import track_lk


def default_camera_matrix(w: int, h: int) -> np.ndarray:
    """Reference heuristic intrinsics: f = 0.8 * width (slam.py:510-514)."""
    return np.array(
        [[0.8 * w, 0.0, w / 2.0], [0.0, 0.8 * w, h / 2.0], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )


class VisualOdometry:
    """Feature-tracking visual odometry (reference VisualOdometry, slam.py:24-229)."""

    def __init__(
        self,
        camera_matrix: np.ndarray,
        max_features: int = 2000,
        min_tracked_redetect: int = 500,
        min_tracked_reinit: int = 8,
        seed: int = 0,
    ):
        self.K = np.asarray(camera_matrix, np.float32)
        self.max_features = max_features
        self.min_tracked_redetect = min_tracked_redetect
        self.min_tracked_reinit = min_tracked_reinit
        self.current_pose = np.eye(4, dtype=np.float64)
        self.trajectory: List[np.ndarray] = [self.current_pose[:3, 3].copy()]
        self.prev_gray: Optional[jnp.ndarray] = None
        self.pts: Optional[jnp.ndarray] = None
        self.pts_valid: Optional[jnp.ndarray] = None
        self._key = jax.random.PRNGKey(seed)
        self._frame = 0
        self.last_num_tracked = 0
        self.last_num_inliers = 0

    # ------------------------------------------------------------------ steps
    def detect_features(self, gray: jnp.ndarray):
        kps = fast_ops.detect_fast(gray, self.max_features, 20.0, 16, 9)
        return kps.xy, kps.valid

    def process_frame(self, frame_bgr: np.ndarray) -> np.ndarray:
        """Returns the updated 4x4 pose. BGR uint8 input."""
        gray = color.bgr2gray(jnp.asarray(frame_bgr))
        if self.prev_gray is None:
            self.pts, self.pts_valid = self.detect_features(gray)
            self.prev_gray = gray
            return self.current_pose

        pts1, valid = track_lk(self.prev_gray, gray, self.pts, self.pts_valid)
        n_tracked = int(jax.device_get(valid.sum()))
        self.last_num_tracked = n_tracked

        if n_tracked >= self.min_tracked_reinit:
            self._key, sub = jax.random.split(self._key)
            res = find_essential_and_pose(
                self.pts, pts1, valid, jnp.asarray(self.K), sub
            )
            self.last_num_inliers = int(jax.device_get(res.num_inliers))
            if bool(jax.device_get(res.ok)):
                R = np.asarray(res.R, np.float64)
                t = np.asarray(res.t, np.float64)
                # camera motion X2 = R X1 + t -> camera-2 pose in camera-1 frame:
                T_rel = np.eye(4)
                T_rel[:3, :3] = R.T
                T_rel[:3, 3] = -R.T @ t
                self.current_pose = self.current_pose @ T_rel
        self.trajectory.append(self.current_pose[:3, 3].copy())

        # rotate tracking state; re-detect when the track set collapses
        if n_tracked < self.min_tracked_redetect:
            self.pts, self.pts_valid = self.detect_features(gray)
        else:
            self.pts, self.pts_valid = pts1, valid
        self.prev_gray = gray
        self._frame += 1
        return self.current_pose

    def draw_trajectory_overlay(self, frame: np.ndarray, size: int = 200) -> np.ndarray:
        """2D top-down trajectory inset (reference slam.py:203-229)."""
        import cv2

        out = frame.copy()
        panel = np.zeros((size, size, 3), np.uint8)
        traj = np.asarray(self.trajectory)
        if len(traj) >= 2:
            xz = traj[:, [0, 2]]
            span = max(np.abs(xz).max(), 1e-6)
            pts = ((xz / span) * (size * 0.45) + size / 2).astype(np.int32)
            for a, b in zip(pts[:-1], pts[1:]):
                cv2.line(panel, tuple(a), tuple(b), (0, 255, 0), 1)
            cv2.circle(panel, tuple(pts[-1]), 3, (0, 0, 255), -1)
        out[10 : 10 + size, 10 : 10 + size] = cv2.addWeighted(
            out[10 : 10 + size, 10 : 10 + size], 0.3, panel, 0.7, 0
        )
        return out


class SimpleSLAM:
    """Keyframe-based SLAM wrapper (reference SimpleSLAM, slam.py:232-390):
    keyframe when translation > 0.5 or rotation angle > 0.3 rad."""

    def __init__(self, camera_matrix: np.ndarray, **vo_kwargs):
        self.vo = VisualOdometry(camera_matrix, **vo_kwargs)
        self.keyframes: List[dict] = []
        self.translation_threshold = 0.5
        self.rotation_threshold = 0.3
        self.fps = 0.0
        self._last_t = None

    def should_create_keyframe(self, pose: np.ndarray) -> bool:
        if not self.keyframes:
            return True
        last = self.keyframes[-1]["pose"]
        dt = np.linalg.norm(pose[:3, 3] - last[:3, 3])
        dR = pose[:3, :3] @ last[:3, :3].T
        angle = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        return dt > self.translation_threshold or angle > self.rotation_threshold

    def _add_keyframe(self, frame_bgr: np.ndarray, pose: np.ndarray):
        gray = color.bgr2gray(jnp.asarray(frame_bgr))
        kps = fast_ops.detect_fast(gray, 512, 20.0, 16, 9)
        desc = orb_ops.describe_orb(gray, kps)
        self.keyframes.append(
            {
                "pose": pose.copy(),
                "kp": np.asarray(kps.xy),
                "desc": np.asarray(desc.bits),
                "valid": np.asarray(kps.valid),
            }
        )

    def triangulate_points(self, kf1: dict, kf2: dict, pts1: np.ndarray, pts2: np.ndarray) -> np.ndarray:
        """Linear triangulation of matched pixels between two keyframes
        (reference slam.py:267-284)."""
        K = self.vo.K
        P1 = K @ np.asarray(kf1["pose"], np.float64)[:3]
        P2 = K @ np.asarray(kf2["pose"], np.float64)[:3]
        out = []
        for p1, p2 in zip(pts1, pts2):
            A = np.stack(
                [
                    p1[0] * P1[2] - P1[0],
                    p1[1] * P1[2] - P1[1],
                    p2[0] * P2[2] - P2[0],
                    p2[1] * P2[2] - P2[1],
                ]
            )
            _, _, vt = np.linalg.svd(A)
            X = vt[-1]
            out.append(X[:3] / X[3])
        return np.asarray(out)

    def process_frame(self, frame_bgr: np.ndarray) -> np.ndarray:
        t0 = time.perf_counter()
        pose = self.vo.process_frame(frame_bgr)
        if self.should_create_keyframe(pose):
            self._add_keyframe(frame_bgr, pose)
        dt = time.perf_counter() - t0
        self.fps = 1.0 / dt if dt > 0 else 0.0
        return pose

    def render_map(self, size: int = 400) -> np.ndarray:
        """Top-down map with keyframe dots (reference slam.py:344-390)."""
        import cv2

        panel = np.zeros((size, size, 3), np.uint8)
        traj = np.asarray(self.vo.trajectory)
        if len(traj) >= 2:
            xz = traj[:, [0, 2]]
            span = max(np.abs(xz).max(), 1e-6)
            pts = ((xz / span) * (size * 0.45) + size / 2).astype(np.int32)
            for a, b in zip(pts[:-1], pts[1:]):
                cv2.line(panel, tuple(a), tuple(b), (0, 255, 0), 1)
            for kf in self.keyframes:
                p = kf["pose"][:3, 3][[0, 2]]
                q = ((p / span) * (size * 0.45) + size / 2).astype(np.int32)
                cv2.circle(panel, tuple(q), 3, (255, 128, 0), -1)
            cv2.circle(panel, tuple(pts[-1]), 4, (0, 0, 255), -1)
        cv2.putText(panel, f"kf: {len(self.keyframes)}  fps: {self.fps:.1f}", (8, size - 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.45, (255, 255, 255), 1)
        return panel
