"""Stereo tests against the synthetic known-disparity oracle."""

import numpy as np
import pytest

from rtvm_tpu.stereo.depth import StereoDepthEstimator, StereoTerrainMapper, demo_stereo_depth
from rtvm_tpu.stereo.refine import guided_refine, speckle_suppress
from rtvm_tpu.stereo.sgm import disparity_to_depth, sgm_disparity


def _slanted_plane_pair(h=96, w=160, d0=4.0, d1=18.0, seed=5):
    """Textured scene whose disparity ramps linearly left->right (a slanted
    plane): harder than fronto-parallel rectangles — SGM's constant-disparity
    prior fights the ramp, and subpixel interpolation must carry it."""
    rng = np.random.RandomState(seed)
    tex = rng.randint(0, 255, (h, w + 64), np.uint8).astype(np.float32)
    import cv2

    tex = cv2.GaussianBlur(tex, (0, 0), 1.2)
    xs = np.arange(w, dtype=np.float32)
    # Left-image disparity ramp d_L(x) = d0 + s*x; the right-image pixel xr sees
    # the left pixel xl solving xr = xl - d_L(xl)  =>  xl = (xr + d0) / (1 - s).
    s = (d1 - d0) / (w - 1)
    left = tex[:, 32 : 32 + w]
    xl = (xs + d0) / (1.0 - s)
    src = 32 + xl[None, :]
    x0 = np.floor(src).astype(int)
    frac = src - x0
    right = tex[np.arange(h)[:, None], x0] * (1 - frac) + tex[np.arange(h)[:, None], x0 + 1] * frac
    gt = np.tile(d0 + s * xs, (h, 1))
    return left, right.astype(np.float32), gt


def test_slanted_plane_disparity_mae():
    import jax.numpy as jnp

    left, right, gt = _slanted_plane_pair()
    res = sgm_disparity(jnp.asarray(left), jnp.asarray(right), 32)
    raw = np.asarray(res.disparity)
    refined = np.asarray(guided_refine(speckle_suppress(res.disparity), jnp.asarray(left)))
    # Interior (skip borders where the census window + ramp endpoints degrade)
    sl = np.s_[8:-8, 12:-12]
    raw_v = (raw[sl] >= 0)
    assert raw_v.mean() > 0.7
    mae_raw = np.abs(raw[sl][raw_v] - gt[sl][raw_v]).mean()
    ref_v = refined[sl] >= 0
    mae_ref = np.abs(refined[sl][ref_v] - gt[sl][ref_v]).mean()
    assert mae_raw < 1.0
    # Refinement must not hurt, and the refined map must be denser.
    assert mae_ref <= mae_raw + 0.05
    assert ref_v.mean() >= raw_v.mean()


def test_speckle_suppress_removes_isolated_blob():
    import jax.numpy as jnp

    d = np.full((64, 64), 10.0, np.float32)
    d[20:23, 30:33] = 25.0  # 9-px speckle far from its surroundings
    d[40:60, 5:25] = 24.0  # 400-px coherent region: must survive
    out = np.asarray(speckle_suppress(jnp.asarray(d), radius=6, max_diff=1.5, min_support=24))
    assert (out[20:23, 30:33] < 0).all()
    assert (out[45:55, 10:20] == 24.0).all()
    assert (out[5:15, 40:60] == 10.0).all()


def test_guided_refine_fills_holes_preserves_edges():
    import jax.numpy as jnp

    h, w = 64, 64
    guide = np.zeros((h, w), np.float32)
    guide[:, 32:] = 200.0  # hard intensity edge at x=32
    d = np.where(guide > 0, 20.0, 5.0).astype(np.float32)
    d[10:14, 10:14] = -1.0  # hole inside the left region
    out = np.asarray(guided_refine(jnp.asarray(d), jnp.asarray(guide), radius=8, eps=40.0))
    # hole filled from same-side neighbours
    assert (out[10:14, 10:14] > 0).all()
    assert np.abs(out[10:14, 10:14] - 5.0).max() < 1.0
    # the disparity edge stays within ~2px of the intensity edge
    mid = out[32]
    assert mid[28] < 8.0 and mid[36] > 17.0


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
