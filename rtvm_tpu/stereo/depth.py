"""Stereo depth estimation pipeline (reference stereo_depth.py:16-419):
calibration (host OpenCV), rectification, SGM disparity (TPU), depth conversion,
colored point clouds, terrain mapper with obstacle masks."""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import color
from rtvm_tpu.stereo.sgm import disparity_to_depth, sgm_disparity


class StereoDepthEstimator:
    """Counterpart of reference StereoDepthEstimator (stereo_depth.py:16-352)."""

    def __init__(
        self,
        baseline_m: float = 0.12,
        focal_px: float = 700.0,
        num_disparities: int = 128,
        use_wls: bool = True,
        use_speckle: bool = True,
    ):
        self.baseline = baseline_m
        self.focal = focal_px
        self.num_disparities = num_disparities
        # Post-filters mirror the reference's SGBM+WLS mode (stereo_depth.py:76-99,
        # wls lambda 8000 / sigma 1.5) and its speckle filtering; disable both to
        # get the raw-SGM equivalent of its BM mode.
        self.use_wls = use_wls
        self.use_speckle = use_speckle
        self.calibrated = False
        self.maps = None  # rectification maps after calibration
        self.Q = None

    # ----------------------------------------------------------- calibration
    def calibrate_stereo_cameras(
        self,
        left_images: List[np.ndarray],
        right_images: List[np.ndarray],
        board_size: Tuple[int, int] = (9, 6),
        square_mm: float = 25.0,
    ) -> bool:
        """Chessboard stereo calibration (reference stereo_depth.py:101-199) —
        host-side OpenCV; updates focal/baseline and rectification maps."""
        import cv2

        objp = np.zeros((board_size[0] * board_size[1], 3), np.float32)
        objp[:, :2] = np.mgrid[0 : board_size[0], 0 : board_size[1]].T.reshape(-1, 2)
        objp *= square_mm / 1000.0
        obj_pts, l_pts, r_pts = [], [], []
        shape = None
        crit = (cv2.TERM_CRITERIA_EPS + cv2.TERM_CRITERIA_MAX_ITER, 30, 1e-3)
        for li, ri in zip(left_images, right_images):
            gl = cv2.cvtColor(li, cv2.COLOR_BGR2GRAY)
            gr = cv2.cvtColor(ri, cv2.COLOR_BGR2GRAY)
            shape = gl.shape[::-1]
            okl, cl = cv2.findChessboardCorners(gl, board_size)
            okr, cr = cv2.findChessboardCorners(gr, board_size)
            if okl and okr:
                cl = cv2.cornerSubPix(gl, cl, (11, 11), (-1, -1), crit)
                cr = cv2.cornerSubPix(gr, cr, (11, 11), (-1, -1), crit)
                obj_pts.append(objp)
                l_pts.append(cl)
                r_pts.append(cr)
        if len(obj_pts) < 3:
            return False
        _, K1, d1, _, _ = cv2.calibrateCamera(obj_pts, l_pts, shape, None, None)
        _, K2, d2, _, _ = cv2.calibrateCamera(obj_pts, r_pts, shape, None, None)
        flags = cv2.CALIB_FIX_INTRINSIC
        _, K1, d1, K2, d2, R, T, _, _ = cv2.stereoCalibrate(
            obj_pts, l_pts, r_pts, K1, d1, K2, d2, shape, flags=flags, criteria=crit
        )
        R1, R2, P1, P2, Q, _, _ = cv2.stereoRectify(K1, d1, K2, d2, shape, R, T)
        m1 = cv2.initUndistortRectifyMap(K1, d1, R1, P1, shape, cv2.CV_32FC1)
        m2 = cv2.initUndistortRectifyMap(K2, d2, R2, P2, shape, cv2.CV_32FC1)
        self.maps = (m1, m2)
        self.Q = Q
        self.baseline = float(abs(T[0, 0]))
        self.focal = float(P1[0, 0])
        self.calibrated = True
        return True

    def rectify_images(self, left: np.ndarray, right: np.ndarray):
        import cv2

        if self.maps is None:
            return left, right
        (m1x, m1y), (m2x, m2y) = self.maps
        return (
            cv2.remap(left, m1x, m1y, cv2.INTER_LINEAR),
            cv2.remap(right, m2x, m2y, cv2.INTER_LINEAR),
        )

    # ------------------------------------------------------------- disparity
    def compute_disparity(self, left_bgr: np.ndarray, right_bgr: np.ndarray) -> np.ndarray:
        gl = color.bgr2gray(jnp.asarray(left_bgr))
        gr = color.bgr2gray(jnp.asarray(right_bgr))
        res = sgm_disparity(gl, gr, self.num_disparities)
        disp = res.disparity
        if self.use_speckle:
            from rtvm_tpu.stereo.refine import speckle_suppress

            disp = speckle_suppress(disp)
        if self.use_wls:
            from rtvm_tpu.stereo.refine import guided_refine

            disp = guided_refine(disp, gl)
        return np.asarray(disp)

    def disparity_to_depth(self, disparity: np.ndarray) -> np.ndarray:
        return disparity_to_depth(disparity, self.focal, self.baseline)

    # ----------------------------------------------------------- point cloud
    def create_point_cloud(
        self, disparity: np.ndarray, left_bgr: np.ndarray
    ) -> np.ndarray:
        """[N, 6] XYZRGB (reference stereo_depth.py:265-310)."""
        h, w = disparity.shape
        depth = self.disparity_to_depth(disparity)
        valid = (disparity > 0) & (depth > 0)
        us, vs = np.meshgrid(np.arange(w), np.arange(h))
        z = depth[valid]
        x = (us[valid] - w / 2.0) * z / self.focal
        y = (vs[valid] - h / 2.0) * z / self.focal
        rgb = left_bgr[valid][:, ::-1]
        return np.concatenate([np.stack([x, y, z], 1), rgb], axis=1).astype(np.float32)

    def save_point_cloud(self, cloud_xyzrgb: np.ndarray, path: str):
        from rtvm_tpu.io.ply import write_ply_points

        write_ply_points(path, cloud_xyzrgb[:, :3], cloud_xyzrgb[:, 3:].astype(np.uint8))

    # --------------------------------------------------------- visualization
    @staticmethod
    def colorize_disparity(disparity: np.ndarray) -> np.ndarray:
        import cv2

        d = np.where(disparity > 0, disparity, 0)
        dn = (d / max(d.max(), 1e-6) * 255).astype(np.uint8)
        return cv2.applyColorMap(dn, cv2.COLORMAP_JET)

    @staticmethod
    def colorize_depth(depth: np.ndarray) -> np.ndarray:
        import cv2

        d = np.where(depth > 0, depth, 0)
        dn = (d / max(d.max(), 1e-6) * 255).astype(np.uint8)
        return cv2.applyColorMap(dn, cv2.COLORMAP_MAGMA)


class StereoTerrainMapper:
    """Per-pair terrain products (reference StereoTerrainMapper,
    stereo_depth.py:355-419)."""

    def __init__(self, estimator: Optional[StereoDepthEstimator] = None):
        self.est = estimator or StereoDepthEstimator()

    def process_stereo_frame(self, left_bgr: np.ndarray, right_bgr: np.ndarray) -> dict:
        left_r, right_r = self.est.rectify_images(left_bgr, right_bgr)
        disp = self.est.compute_disparity(left_r, right_r)
        depth = self.est.disparity_to_depth(disp)
        return {
            "disparity": disp,
            "depth": depth,
            "cloud": self.est.create_point_cloud(disp, left_r),
            "disparity_vis": self.est.colorize_disparity(disp),
            "depth_vis": self.est.colorize_depth(depth),
        }

    @staticmethod
    def depth_profile(depth: np.ndarray, row: Optional[int] = None) -> np.ndarray:
        r = row if row is not None else depth.shape[0] // 2
        return depth[r]

    @staticmethod
    def obstacle_mask(depth: np.ndarray, max_distance_m: float = 2.0) -> np.ndarray:
        """Near-obstacle mask with open/close morphology (stereo_depth.py:406-419)."""
        import cv2

        m = ((depth > 0) & (depth < max_distance_m)).astype(np.uint8)
        k = np.ones((5, 5), np.uint8)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, k)
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k)
        return m > 0


def demo_stereo_depth(size=(120, 160), shift_far: int = 5, shift_near: int = 20):
    """Synthetic shifted-rectangle stereo pair with known disparities — the
    correctness oracle from reference stereo_depth.py:422-481."""
    rng = np.random.RandomState(3)
    h, w = size
    base = (rng.rand(h, w, 3) * 60 + 40).astype(np.uint8)
    left = base.copy()
    right = base.copy()

    def put(img, x0, y0, patch):
        bh, bw = patch.shape[:2]
        img[y0 : y0 + bh, x0 : x0 + bw] = patch

    # textured rectangles (uniform patches would be ambiguous for any matcher)
    far_patch = (rng.rand(30, 40, 3) * 80 + 150).astype(np.uint8)
    near_patch = (rng.rand(35, 50, 3) * 80 + 120).astype(np.uint8)
    put(left, 90, 20, far_patch)
    put(right, 90 - shift_far, 20, far_patch)
    put(left, 40, 70, near_patch)
    put(right, 40 - shift_near, 70, near_patch)

    est = StereoDepthEstimator(num_disparities=32)
    disp = est.compute_disparity(left, right)
    return left, right, disp
