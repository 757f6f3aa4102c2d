"""SIFT-style DoG features as fixed-shape XLA ops.

TPU-native replacement for cv2.SIFT_create(700) (reference main.py:33): a Gaussian
scale-space pyramid, DoG extrema with contrast + edge (Hessian-ratio) tests and 2D
subpixel refinement, dominant gradient orientation, and 4x4x8 = 128-d gradient-histogram
descriptors.

Everything is shape-stable under jit: each octave contributes a fixed keypoint quota
(geometric split of max_keypoints) selected by top-k over its DoG responses; the soft
trilinear histogram binning is expressed as one batched einsum ([16 spatial bins x S
samples] @ [S samples x 8 orientation bins]) which lands on the MXU.

Self-consistency note: descriptors only ever match other descriptors from this code, so
bit-parity with OpenCV's implementation is not a goal; geometric accuracy (subpixel
keypoints, rotation invariance) is.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.filters import gaussian_blur, maxpool3x3
from rtvm_tpu.ops.sampling import bilinear_sample


def _octave_quotas(k: int, octaves: int) -> list[int]:
    """Geometric split of the keypoint budget across octaves (finest gets most)."""
    raw = np.array([2.0 ** (-o) for o in range(octaves)])
    q = np.floor(k * raw / raw.sum()).astype(int)
    q[0] += k - q.sum()
    return [int(x) for x in q]


def _detect_octave(gauss, dogs, quota, contrast_threshold, edge_r, border):
    """Find up to `quota` extrema in one octave.

    gauss: [L, H, W] Gaussian levels; dogs: [L-1, H, W]. Extrema are sought in DoG
    layers 1..L-3 (each compared against its 3x3x3 neighbourhood).
    Returns (xy [Q,2] octave coords, level [Q] int32, score [Q], valid [Q]).
    """
    nl, h, w = dogs.shape
    mid = dogs[1:-1]  # [S, H, W] candidate layers

    # 3x3x3 neighbourhood max/min via 2D maxpool + cross-layer comparisons.
    def pool(x):
        return maxpool3x3(x)

    pmax = pool(dogs)
    pmin = -pool(-dogs)
    is_max = (mid >= pmax[:-2]) & (mid >= pmax[2:]) & (mid >= pool(mid) - 1e-12) & (mid > 0)
    is_min = (mid <= pmin[:-2]) & (mid <= pmin[2:]) & (mid <= -pool(-mid) + 1e-12) & (mid < 0)
    score = jnp.abs(mid)
    extremum = (is_max | is_min) & (score > contrast_threshold)

    # Edge rejection: Hessian trace^2/det test (Lowe r = edge_r).
    dxx = jnp.roll(mid, -1, axis=2) + jnp.roll(mid, 1, axis=2) - 2 * mid
    dyy = jnp.roll(mid, -1, axis=1) + jnp.roll(mid, 1, axis=1) - 2 * mid
    dxy = 0.25 * (
        jnp.roll(jnp.roll(mid, -1, 1), -1, 2)
        + jnp.roll(jnp.roll(mid, 1, 1), 1, 2)
        - jnp.roll(jnp.roll(mid, -1, 1), 1, 2)
        - jnp.roll(jnp.roll(mid, 1, 1), -1, 2)
    )
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    edge_ok = (det > 0) & (tr * tr * edge_r < (edge_r + 1.0) ** 2 * det)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    inside = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

    final = jnp.where(extremum & edge_ok & inside, score, 0.0)
    top, idx = jax.lax.top_k(final.reshape(-1), quota)
    lvl = idx // (h * w)
    rem = idx % (h * w)
    ky = rem // w
    kx = rem % w
    valid = top > 0.0

    # 2D subpixel refinement from the DoG spatial quadratic around each keypoint.
    g_x = 0.5 * (mid[lvl, ky, jnp.clip(kx + 1, 0, w - 1)] - mid[lvl, ky, jnp.clip(kx - 1, 0, w - 1)])
    g_y = 0.5 * (mid[lvl, jnp.clip(ky + 1, 0, h - 1), kx] - mid[lvl, jnp.clip(ky - 1, 0, h - 1), kx])
    hxx = dxx[lvl, ky, kx]
    hyy = dyy[lvl, ky, kx]
    hxy = dxy[lvl, ky, kx]
    deth = hxx * hyy - hxy * hxy
    deth = jnp.where(jnp.abs(deth) < 1e-12, 1e-12, deth)
    ox = jnp.clip(-(hyy * g_x - hxy * g_y) / deth, -0.5, 0.5)
    oy = jnp.clip(-(hxx * g_y - hxy * g_x) / deth, -0.5, 0.5)

    xy = jnp.stack([kx.astype(jnp.float32) + ox, ky.astype(jnp.float32) + oy], axis=-1)
    return xy, (lvl + 1).astype(jnp.int32), jnp.where(valid, top, 0.0), valid


def _orientation(gmag, gori, xy, lvl, sigmas, radius):
    """Dominant gradient orientation per keypoint via a 36-bin weighted histogram.

    gmag/gori: [L, H, W]; xy [Q, 2] octave coords; lvl [Q] level index; sigmas [L].
    """
    h, w = gmag.shape[1], gmag.shape[2]
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    dy = d[:, None, None]
    dx = d[None, :, None]  # broadcasting helpers

    cy = xy[:, 1].astype(jnp.int32)
    cx = xy[:, 0].astype(jnp.int32)
    ys = jnp.clip(cy[:, None, None] + d.astype(jnp.int32)[None, :, None], 0, h - 1)
    xs = jnp.clip(cx[:, None, None] + d.astype(jnp.int32)[None, None, :], 0, w - 1)
    lv = lvl[:, None, None]
    mag = gmag[lv, ys, xs]  # [Q, P, P]
    ori = gori[lv, ys, xs]

    sig_ori = 1.5 * sigmas[lvl]  # [Q]
    r2 = d[:, None] ** 2 + d[None, :] ** 2  # [P, P]
    wgt = jnp.exp(-r2[None] / (2.0 * (sig_ori**2)[:, None, None])) * mag

    bins = jnp.floor(ori / (2.0 * jnp.pi) * 36.0).astype(jnp.int32) % 36  # [Q, P, P]
    onehot = jax.nn.one_hot(bins.reshape(bins.shape[0], -1), 36, dtype=jnp.float32)
    hist = jnp.einsum("qs,qsb->qb", wgt.reshape(wgt.shape[0], -1), onehot)
    # light circular smoothing of the histogram
    hist = (
        hist
        + 0.5 * (jnp.roll(hist, 1, axis=1) + jnp.roll(hist, -1, axis=1))
    )
    peak = jnp.argmax(hist, axis=1).astype(jnp.float32)
    return (peak + 0.5) * (2.0 * jnp.pi / 36.0)


def _descriptors(gmag, gori, xy, lvl, theta, sigmas, n_spatial=4, n_ori=8, n_grid=16):
    """128-d gradient histogram descriptors via soft trilinear binning as one einsum."""
    h, w = gmag.shape[1], gmag.shape[2]
    q = xy.shape[0]

    # Sample grid in the keypoint's rotated frame: n_grid x n_grid points covering
    # [-R, R], R = 6 * sigma(level).
    u = jnp.linspace(-1.0, 1.0, n_grid)
    gu, gv = jnp.meshgrid(u, u, indexing="xy")
    gu = gu.reshape(-1)[None]  # [1, S]
    gv = gv.reshape(-1)[None]
    radius = 6.0 * sigmas[lvl][:, None]  # [Q, 1]
    cth = jnp.cos(theta)[:, None]
    sth = jnp.sin(theta)[:, None]
    px = gu * radius
    py = gv * radius
    sxs = xy[:, 0:1] + cth * px - sth * py  # [Q, S]
    sys_ = xy[:, 1:2] + sth * px + cth * py

    lv = lvl[:, None]
    # bilinear sample from the keypoint's level: build flat gather over [L*H*W]
    x0 = jnp.clip(jnp.floor(sxs), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(sys_), 0, h - 2).astype(jnp.int32)
    fx = jnp.clip(sxs - x0, 0.0, 1.0)
    fy = jnp.clip(sys_ - y0, 0.0, 1.0)

    def gather(img):
        p00 = img[lv, y0, x0]
        p01 = img[lv, y0, x0 + 1]
        p10 = img[lv, y0 + 1, x0]
        p11 = img[lv, y0 + 1, x0 + 1]
        return (
            p00 * (1 - fx) * (1 - fy)
            + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy
            + p11 * fx * fy
        )

    mag = gather(gmag)  # [Q, S]
    # orientation is circular — interpolate via sin/cos to avoid wrap artifacts
    ori_s = gather(jnp.sin(gori))
    ori_c = gather(jnp.cos(gori))
    ori = jnp.arctan2(ori_s, ori_c) - theta[:, None]

    # Gaussian weighting over the descriptor window.
    wgt = mag * jnp.exp(-(gu**2 + gv**2) / (2.0 * 0.5**2))

    # Soft spatial binning: continuous bin coords in [-0.5, n_spatial-0.5].
    bx = (gu + 1.0) * 0.5 * n_spatial - 0.5  # [1, S]
    by = (gv + 1.0) * 0.5 * n_spatial - 0.5
    bx = jnp.broadcast_to(bx, mag.shape)
    by = jnp.broadcast_to(by, mag.shape)

    def soft_1d(b, n):
        i0 = jnp.clip(jnp.floor(b), 0, n - 1).astype(jnp.int32)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        f = jnp.clip(b - jnp.floor(b), 0.0, 1.0)
        w0 = jax.nn.one_hot(i0, n, dtype=jnp.float32) * (1 - f)[..., None]
        w1 = jax.nn.one_hot(i1, n, dtype=jnp.float32) * f[..., None]
        return w0 + w1  # [..., n]

    wx = soft_1d(bx, n_spatial)  # [Q, S, 4]
    wy = soft_1d(by, n_spatial)
    wspace = (wy[..., :, None] * wx[..., None, :]).reshape(q, -1, n_spatial * n_spatial)

    bo = (ori % (2.0 * jnp.pi)) / (2.0 * jnp.pi) * n_ori  # [Q, S] in [0, 8)
    o0 = jnp.floor(bo).astype(jnp.int32) % n_ori
    o1 = (o0 + 1) % n_ori
    fo = bo - jnp.floor(bo)
    wori = (
        jax.nn.one_hot(o0, n_ori, dtype=jnp.float32) * (1 - fo)[..., None]
        + jax.nn.one_hot(o1, n_ori, dtype=jnp.float32) * fo[..., None]
    )  # [Q, S, 8]

    # [Q, 16, S] @ [Q, S, 8] -> [Q, 16, 8] on the MXU.
    desc = jnp.einsum("qsb,qso->qbo", wspace * wgt[..., None], wori)
    desc = desc.reshape(q, n_spatial * n_spatial * n_ori)

    # SIFT normalization: unit norm, clip 0.2, renormalize.
    norm = jnp.sqrt(jnp.sum(desc**2, axis=-1, keepdims=True)) + 1e-7
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.sqrt(jnp.sum(desc**2, axis=-1, keepdims=True)) + 1e-7
    return desc / norm


def detect_and_describe(gray: jnp.ndarray, cfg) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """gray [H, W] float (0..255) -> (xy [K, 2] full-res coords, desc [K, 128] float32,
    valid [K]). cfg is a FeatureConfig."""
    k = cfg.max_keypoints
    s = cfg.sift_scales
    octaves = cfg.sift_octaves
    sigma0 = cfg.sift_sigma
    quotas = _octave_quotas(k, octaves)

    img = gray / 255.0
    h0, w0 = img.shape
    # Per-level absolute sigmas within an octave.
    kfac = 2.0 ** (1.0 / s)
    sigmas = np.array([sigma0 * kfac**l for l in range(s + 3)], dtype=np.float32)
    inc = np.sqrt(np.maximum(sigmas[1:] ** 2 - sigmas[:-1] ** 2, 1e-6))

    xs_all, desc_all, valid_all = [], [], []
    base = gaussian_blur(img, float(np.sqrt(max(sigma0**2 - 0.25, 0.01))))
    for o in range(octaves):
        h, w = base.shape
        levels = [base]
        for l in range(s + 2):
            levels.append(gaussian_blur(levels[-1], float(inc[l])))
        gauss = jnp.stack(levels)  # [s+3, H, W]
        dogs = gauss[1:] - gauss[:-1]  # [s+2, H, W]

        xy, lvl, _, valid = _detect_octave(
            gauss, dogs, quotas[o], cfg.sift_contrast_threshold, 10.0, cfg.border_margin
        )

        gx = 0.5 * (jnp.roll(gauss, -1, axis=2) - jnp.roll(gauss, 1, axis=2))
        gy = 0.5 * (jnp.roll(gauss, -1, axis=1) - jnp.roll(gauss, 1, axis=1))
        gmag = jnp.sqrt(gx * gx + gy * gy)
        gori = jnp.arctan2(gy, gx) % (2.0 * jnp.pi)

        sig = jnp.asarray(sigmas)
        theta = _orientation(gmag, gori, xy, lvl, sig, radius=int(math.ceil(4.5 * sigmas[s])))
        desc = _descriptors(gmag, gori, xy, lvl, theta, sig)

        scale = float(2**o)
        xs_all.append(xy * scale)
        desc_all.append(desc)
        valid_all.append(valid)

        if o + 1 < octaves:
            base = gauss[s][::2, ::2]

    xy = jnp.concatenate(xs_all, axis=0)
    desc = jnp.concatenate(desc_all, axis=0)
    valid = jnp.concatenate(valid_all, axis=0)
    xy = jnp.where(valid[:, None], xy, 0.0)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return xy, desc, valid
