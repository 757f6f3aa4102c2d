"""Stereo tests against the synthetic known-disparity oracle."""

import numpy as np
import pytest

from rtvm_tpu.stereo.depth import StereoDepthEstimator, StereoTerrainMapper, demo_stereo_depth
from rtvm_tpu.stereo.sgm import disparity_to_depth


def test_demo_recovers_known_disparities():
    left, right, disp = demo_stereo_depth(shift_far=5, shift_near=20)
    # sample interiors of the two rectangles
    far = disp[28:44, 96:124]
    near = disp[78:98, 48:84]
    far_v = far[far > 0]
    near_v = near[near > 0]
    assert len(far_v) > 40 and len(near_v) > 60
    assert abs(np.median(far_v) - 5) <= 1.5
    assert abs(np.median(near_v) - 20) <= 1.5


def test_disparity_to_depth_clamps():
    disp = np.array([[0.0, 0.05, 1.0, 10.0]], np.float32)
    z = disparity_to_depth(disp, focal_px=700.0, baseline_m=0.12)
    assert z[0, 0] == 0.0 and z[0, 1] == 0.0  # below min_disp
    assert abs(z[0, 2] - 84.0) < 1e-3  # f*B/d = 700*0.12/1
    assert abs(z[0, 3] - 8.4) < 1e-3


def test_point_cloud_from_disparity():
    left, right, disp = demo_stereo_depth()
    est = StereoDepthEstimator(num_disparities=32)
    cloud = est.create_point_cloud(disp, left)
    assert cloud.shape[1] == 6
    assert len(cloud) > 100
    assert (cloud[:, 2] > 0).all()


def test_terrain_mapper_products():
    left, right, _ = demo_stereo_depth()
    mapper = StereoTerrainMapper(StereoDepthEstimator(num_disparities=32))
    res = mapper.process_stereo_frame(left, right)
    for k in ("disparity", "depth", "cloud", "disparity_vis", "depth_vis"):
        assert k in res
    prof = mapper.depth_profile(res["depth"])
    assert prof.shape[0] == left.shape[1]
    mask = mapper.obstacle_mask(res["depth"], max_distance_m=5.0)
    assert mask.dtype == bool
