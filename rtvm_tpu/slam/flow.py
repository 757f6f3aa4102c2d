"""Pyramidal Lucas-Kanade optical flow as batched JAX ops.

TPU-native replacement for cv2.calcOpticalFlowPyrLK as used by the reference visual
odometry (slam.py:78-102: 21x21 window, 3 pyramid levels, forward+backward tracking
with a 1 px consistency gate). All K tracks iterate in lockstep under vmap; the
pyramid is built once per frame with separable blurs + 2x decimation.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp

from rtvm_tpu.ops.filters import gaussian_blur
from rtvm_tpu.ops.sampling import bilinear_sample


def build_pyramid(gray: jnp.ndarray, levels: int = 3) -> List[jnp.ndarray]:
    """[H, W] float -> list of `levels` images, each half the previous size."""
    pyr = [gray]
    for _ in range(levels - 1):
        pyr.append(gaussian_blur(pyr[-1], 1.0)[::2, ::2])
    return pyr


def _lk_level(img0, img1, pts0, guess, win_radius: int, iters: int):
    """One pyramid level of LK: refine `guess` displacement for pts0 [K, 2]."""
    r = win_radius
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    dy = d[:, None]
    dx = d[None, :]

    gx_img = 0.5 * (jnp.roll(img0, -1, 1) - jnp.roll(img0, 1, 1))
    gy_img = 0.5 * (jnp.roll(img0, -1, 0) - jnp.roll(img0, 1, 0))

    def one_point(p, g):
        xs = p[0] + dx
        ys = p[1] + dy
        t0 = bilinear_sample(img0, xs, ys)
        gx = bilinear_sample(gx_img, xs, ys)
        gy = bilinear_sample(gy_img, xs, ys)
        a11 = jnp.sum(gx * gx)
        a12 = jnp.sum(gx * gy)
        a22 = jnp.sum(gy * gy)
        det = a11 * a22 - a12 * a12
        ok = det > 1e-4

        def body(i, dv):
            t1 = bilinear_sample(img1, xs + dv[0], ys + dv[1])
            e = t1 - t0
            b1 = jnp.sum(e * gx)
            b2 = jnp.sum(e * gy)
            inv_det = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            du = -(a22 * b1 - a12 * b2) * inv_det
            dvv = -(-a12 * b1 + a11 * b2) * inv_det
            return dv + jnp.array([du, dvv])

        dv = jax.lax.fori_loop(0, iters, body, g)
        return dv, ok

    return jax.vmap(one_point)(pts0, guess)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def track_lk(
    gray0: jnp.ndarray,
    gray1: jnp.ndarray,
    pts0: jnp.ndarray,
    valid0: jnp.ndarray,
    levels: int = 3,
    win_radius: int = 10,
    iters: int = 10,
):
    """Track pts0 [K, 2] from gray0 to gray1 with forward-backward verification.

    Returns (pts1 [K, 2], valid [K]) — valid requires fb error < 1 px and in-bounds.
    """
    h, w = gray0.shape
    p0 = build_pyramid(gray0, levels)
    p1 = build_pyramid(gray1, levels)

    def run(pyr_a, pyr_b, pts):
        disp = jnp.zeros_like(pts)  # displacement in current-level pixel units
        ok_all = jnp.ones(pts.shape[0], bool)
        for lvl in range(levels - 1, -1, -1):
            scale = 2.0**lvl
            disp, ok = _lk_level(pyr_a[lvl], pyr_b[lvl], pts / scale, disp, win_radius, iters)
            ok_all = ok_all & ok
            if lvl > 0:
                disp = disp * 2.0  # carry to the next finer level
        return disp, ok_all

    fwd, ok_f = run(p0, p1, pts0)
    pts1 = pts0 + fwd
    bwd, ok_b = run(p1, p0, pts1)
    back = pts1 + bwd
    fb_err = jnp.sqrt(jnp.sum((back - pts0) ** 2, axis=-1))
    inb = (
        (pts1[:, 0] >= 1) & (pts1[:, 0] < w - 1) & (pts1[:, 1] >= 1) & (pts1[:, 1] < h - 1)
    )
    valid = valid0 & ok_f & ok_b & (fb_err < 1.0) & inb
    return pts1, valid
