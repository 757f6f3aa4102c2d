"""Stereo matching as TPU kernels: cost volume + semi-global aggregation + WTA.

TPU-native replacement for cv2.StereoSGBM (reference stereo_depth.py:56-99: numDisp
128, block 5, P1/P2 = 8/32 * 3 * block^2, uniqueness 10, speckle filtering). The cost
volume is a batched shifted-SAD over census-transformed images (vectorized over all
disparities at once); the 4-direction semi-global aggregation runs as lax.scan dynamic
programming along rows/columns (the scan carries the [W, D] message — compiler-friendly
sequential structure); disparity is WTA + parabolic subpixel refinement + left-right
consistency masking.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StereoResult(NamedTuple):
    disparity: jnp.ndarray  # [H, W] float32 (px), invalid = -1
    cost_volume: jnp.ndarray  # [H, W, D] aggregated


def census_transform(gray: jnp.ndarray, radius: int = 2) -> jnp.ndarray:
    """[H, W] -> [H, W] uint32 census bitstring over a (2r+1)^2-1 neighbourhood."""
    h, w = gray.shape
    pad = jnp.pad(gray, radius, mode="edge")
    bits = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if dy == 0 and dx == 0:
                continue
            nb = pad[radius + dy : radius + dy + h, radius + dx : radius + dx + w]
            bits.append((nb > gray).astype(jnp.uint32))
    out = jnp.zeros((h, w), jnp.uint32)
    for i, b in enumerate(bits):
        out = out | (b << jnp.uint32(i))
    return out


def build_cost_volume(left: jnp.ndarray, right: jnp.ndarray, num_disp: int) -> jnp.ndarray:
    """Hamming cost between census codes at all disparities -> [H, W, D] float32."""
    h, w = left.shape
    cl = census_transform(left)
    cr = census_transform(right)
    costs = []
    for d in range(num_disp):
        rs = jnp.pad(cr, ((0, 0), (d, 0)), mode="edge")[:, : w]
        ham = jax.lax.population_count(jnp.bitwise_xor(cl, rs)).astype(jnp.float32)
        costs.append(ham)
    return jnp.stack(costs, axis=-1)


def _aggregate_dir(cost: jnp.ndarray, p1: float, p2: float, axis: int, reverse: bool) -> jnp.ndarray:
    """SGM message passing along one direction via lax.scan.

    cost [H, W, D]; axis 0 = vertical scan, axis 1 = horizontal scan.
    """
    c = jnp.swapaxes(cost, 0, axis) if axis == 1 else cost  # scan over leading dim
    if reverse:
        c = c[::-1]

    d = c.shape[-1]
    big = jnp.float32(1e9)

    def step(prev, cur):
        # prev, cur: [W, D]
        m = jnp.min(prev, axis=-1, keepdims=True)  # [W, 1]
        shift_p = jnp.concatenate([prev[:, :1] + big, prev[:, :-1]], axis=-1)
        shift_n = jnp.concatenate([prev[:, 1:], prev[:, -1:] + big], axis=-1)
        best = jnp.minimum(
            jnp.minimum(prev, m + p2), jnp.minimum(shift_p + p1, shift_n + p1)
        )
        out = cur + best - m
        return out, out

    init = c[0]
    _, msgs = jax.lax.scan(step, init, c[1:])
    agg = jnp.concatenate([init[None], msgs], axis=0)
    if reverse:
        agg = agg[::-1]
    return jnp.swapaxes(agg, 0, axis) if axis == 1 else agg


@functools.partial(jax.jit, static_argnums=(2,))
def sgm_disparity(
    left_gray: jnp.ndarray,
    right_gray: jnp.ndarray,
    num_disp: int = 128,
    p1: float = 8.0,
    p2: float = 96.0,
    uniqueness: float = 0.10,
    lr_threshold: float = 1.5,
) -> StereoResult:
    """Full SGM pipeline on [H, W] float grays. Returns subpixel disparity with
    invalid pixels set to -1 (uniqueness + left-right consistency checks)."""
    cost = build_cost_volume(left_gray, right_gray, num_disp)
    agg = (
        _aggregate_dir(cost, p1, p2, axis=1, reverse=False)
        + _aggregate_dir(cost, p1, p2, axis=1, reverse=True)
        + _aggregate_dir(cost, p1, p2, axis=0, reverse=False)
        + _aggregate_dir(cost, p1, p2, axis=0, reverse=True)
    )

    d_int = jnp.argmin(agg, axis=-1)  # [H, W]
    cmin = jnp.min(agg, axis=-1)

    # uniqueness: best must beat second-best (outside +-1 disp) by the margin
    d = agg.shape[-1]
    dd = jax.lax.broadcasted_iota(jnp.int32, agg.shape, 2)
    near = jnp.abs(dd - d_int[..., None]) <= 1
    second = jnp.min(jnp.where(near, 1e9, agg), axis=-1)
    unique_ok = cmin * (1.0 + uniqueness) <= second

    # parabolic subpixel refinement
    dm = jnp.clip(d_int - 1, 0, d - 1)
    dp = jnp.clip(d_int + 1, 0, d - 1)
    cm = jnp.take_along_axis(agg, dm[..., None], axis=-1)[..., 0]
    cp = jnp.take_along_axis(agg, dp[..., None], axis=-1)[..., 0]
    denom = cm + cp - 2.0 * cmin
    offset = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-6), 0.0)
    disp = d_int.astype(jnp.float32) + jnp.clip(offset, -0.5, 0.5)

    # left-right consistency: right disparity via cost-volume re-indexing
    w = left_gray.shape[1]
    xs = jax.lax.broadcasted_iota(jnp.int32, agg.shape, 1)
    # cost for right pixel x at disparity d lives at left pixel x + d
    right_cost = jnp.take_along_axis(agg, jnp.clip(xs + dd, 0, w - 1), axis=1)
    d_right = jnp.argmin(right_cost, axis=-1)
    # check: disp(left x) should match disp(right at x - disp)
    xr = jnp.clip(xs[..., 0] - d_int, 0, w - 1)
    d_r_at = jnp.take_along_axis(d_right, xr, axis=1)
    lr_ok = jnp.abs(d_int - d_r_at) <= lr_threshold

    valid = unique_ok & lr_ok & (d_int > 0)
    disp = jnp.where(valid, disp, -1.0)
    return StereoResult(disparity=disp, cost_volume=agg)


def disparity_to_depth(
    disparity: np.ndarray, focal_px: float, baseline_m: float,
    min_disp: float = 0.1, max_depth: float = 100.0,
) -> np.ndarray:
    """Z = f * B / d with the reference's clamps (stereo_depth.py:244-263)."""
    d = np.where(disparity > min_disp, disparity, np.nan)
    z = focal_px * baseline_m / d
    z = np.where(np.isfinite(z) & (z <= max_depth), z, 0.0)
    return z.astype(np.float32)
