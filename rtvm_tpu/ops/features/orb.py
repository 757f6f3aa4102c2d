"""Oriented-BRIEF (rBRIEF) descriptors without dynamic gathers.

TPU-native replacement for the descriptor stage of cv2.ORB_create(700) (reference
main.py:36). Per-element dynamic gathers cost ~8 ms per million points on TPU, so
this formulation avoids them entirely:

1. one 32x32 patch per keypoint is extracted with vmap'd dynamic_slice (the fast
   sliced-DMA path) from the sigma-blurred image;
2. the intensity-centroid orientation comes from two masked einsum reductions over
   the patches;
3. the angle is quantized to 32 bins (cv2's ORB quantizes to 30); for every bin the
   rotated 256-pair test pattern is precomputed as STATIC flat-patch indices, so
   sampling is constant-index advanced indexing (compiled to static slices), and the
   per-keypoint bin is applied as a one-hot einsum over the 32 candidate bit-vectors.

The descriptor is self-consistent (our detector matches our descriptor); bit-parity
with OpenCV's learned pattern is neither needed nor possible.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.features.fast import Keypoints
from rtvm_tpu.ops.filters import gaussian_blur

PATCH = 32  # patch side; radius 15 covers the rotated 13-px pattern at any angle
N_ANGLE_BINS = 32


class Descriptors(NamedTuple):
    bits: jnp.ndarray  # [K, words] uint32 packed descriptor
    angle: jnp.ndarray  # [K] float32 radians
    valid: jnp.ndarray  # [K] bool


@functools.lru_cache(maxsize=8)
def brief_pattern(n_bits: int = 256, radius: int = 13, seed: int = 0x5EED) -> np.ndarray:
    """[n_bits, 4] float32 (x1, y1, x2, y2) test offsets ~ N(0, (2r/5)^2), clipped to r."""
    rng = np.random.RandomState(seed)
    sigma = (2.0 * radius) / 5.0
    pts = np.clip(rng.randn(n_bits, 4) * sigma, -radius, radius)
    return pts.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rotated_index_tables(n_bits: int, radius: int, patch: int = PATCH, bins: int = N_ANGLE_BINS):
    """Static per-bin nearest-pixel flat indices into a patch**2 vector:
    (idx1 [bins, n_bits], idx2 [bins, n_bits]) int32."""
    pat = brief_pattern(n_bits, radius)
    ctr = (patch - 1) / 2.0
    idx1 = np.zeros((bins, n_bits), np.int32)
    idx2 = np.zeros((bins, n_bits), np.int32)
    for b in range(bins):
        th = 2.0 * np.pi * b / bins
        c, s = np.cos(th), np.sin(th)
        for (xcol, ycol), out in (((0, 1), idx1), ((2, 3), idx2)):
            px, py = pat[:, xcol], pat[:, ycol]
            rx = np.clip(np.round(ctr + c * px - s * py), 0, patch - 1).astype(np.int32)
            ry = np.clip(np.round(ctr + s * px + c * py), 0, patch - 1).astype(np.int32)
            out[b] = ry * patch + rx
    return idx1, idx2


@functools.lru_cache(maxsize=4)
def _moment_masks(radius: int = 15, patch: int = PATCH):
    """Circular-mask dx/dy weight grids [patch, patch] for intensity moments."""
    d = np.arange(patch, dtype=np.float32) - (patch - 1) / 2.0
    yy, xx = np.meshgrid(d, d, indexing="ij")
    circ = (yy**2 + xx**2) <= radius * radius
    return (circ * xx).astype(np.float32), (circ * yy).astype(np.float32)


def extract_patches_batch(imgs: jnp.ndarray, xy: jnp.ndarray, patch: int = PATCH) -> jnp.ndarray:
    """[B, K, patch, patch] patches centered on integer keypoint coords (clamped).

    Cost model (measured): vmap'd dynamic_slice is billed per DMA ROW, and the
    slow path triggers when the source minor dim is not 128-aligned. So:
    (1) images are padded to a 128-multiple width and stacked vertically so ONE
        flat vmap over B*K slices runs instead of a vmap-of-vmap;
    (2) pairs of image rows are column-INTERLEAVED into one row
        (I2[r, 2c+q] = I[2r+q, c]), so a patch needs patch/2+1 DMA rows
        instead of patch (8.9 -> ~4.8 ms for 16x700 patches on v5e). The
        extra row + a parity select reconstructs the EXACT patch for odd
        keypoint rows."""
    b, h, w = imgs.shape
    half = patch // 2
    wp = -(-w // 128) * 128
    # 2 zero rows per image keep the interleave's extra row in-bounds for
    # bottom-edge keypoints WITHOUT shifting their patches (the pad rows are
    # sliced into the (patch+2)-row block but never parity-selected into the
    # output patch).
    hp = h + 2
    big = jnp.pad(imgs, ((0, 0), (0, 2), (0, wp - w))).reshape(b * hp, wp)
    if (b * hp) % 2:  # odd total rows: pad one row so the interleave reshape works
        big = jnp.pad(big, ((0, 1), (0, 0)))
    rows2 = big.shape[0] // 2
    inter = big.reshape(rows2, 2, wp).transpose(0, 2, 1).reshape(rows2, 2 * wp)

    ys = jnp.clip(xy[..., 1].astype(jnp.int32) - half, 0, max(h - patch, 0))
    ys = (ys + jnp.arange(b, dtype=jnp.int32)[:, None] * hp).reshape(-1)
    xs = jnp.clip(xy[..., 0].astype(jnp.int32) - half, 0, w - patch).reshape(-1)
    par = ys % 2
    ybase = ys // 2
    nrows = patch // 2 + 1

    def one(y0, x0):
        return jax.lax.dynamic_slice(inter, (y0, 2 * x0), (nrows, 2 * patch))

    sl = jax.vmap(one)(ybase, xs)  # [BK, patch/2+1, 2*patch]
    # de-interleave to [BK, patch+2, patch], then parity-select the patch rows
    blk = sl.reshape(-1, nrows, patch, 2).transpose(0, 1, 3, 2).reshape(-1, patch + 2, patch)
    out = jnp.where(par[:, None, None] == 0, blk[:, :patch], blk[:, 1 : patch + 1])
    return out.reshape(b, -1, patch, patch)


def extract_patches(img: jnp.ndarray, kps: Keypoints, patch: int = PATCH) -> jnp.ndarray:
    """[K, patch, patch] patches for one image (see extract_patches_batch)."""
    return extract_patches_batch(img[None], kps.xy[None], patch)[0]


def describe_orb_batch(
    grays: jnp.ndarray,
    kp_xy: jnp.ndarray,
    kp_valid: jnp.ndarray,
    n_bits: int = 256,
    pattern_radius: int = 13,
    blur_sigma: float = 2.0,
    orientation_radius: int = 15,
) -> Descriptors:
    """Steered-BRIEF descriptors for [B, K, 2] keypoints over [B, H, W] images.

    Batch-first so every per-keypoint dynamic_slice runs in ONE flat vmap over
    B*K (per-DMA-row billing; see extract_patches_batch)."""
    # uint8 smoothed image (as in OpenCV's ORB): keeps all descriptor intermediates
    # 4x smaller than f32, which matters at large window batches.
    smooth = jax.vmap(
        lambda g: jnp.clip(gaussian_blur(g, blur_sigma), 0, 255).astype(jnp.uint8)
    )(grays)
    patches = extract_patches_batch(smooth, kp_xy)  # [B, K, P, P] uint8
    b, k = patches.shape[:2]

    mx, my = _moment_masks(orientation_radius)
    pf = patches.astype(jnp.float32)
    m10 = jnp.einsum("bkpq,pq->bk", pf, jnp.asarray(mx))
    m01 = jnp.einsum("bkpq,pq->bk", pf, jnp.asarray(my))
    angle = jnp.arctan2(m01, m10)

    idx1, idx2 = _rotated_index_tables(n_bits, pattern_radius)
    flat = patches.reshape(b, k, PATCH * PATCH)
    # static-index sampling for ALL bins at once (uint8): [B, K, bins, n_bits]
    v1 = flat[:, :, jnp.asarray(idx1)]
    v2 = flat[:, :, jnp.asarray(idx2)]
    bits_all = (v1 < v2).reshape(b * k, N_ANGLE_BINS, n_bits)

    bin_f = (angle % (2.0 * jnp.pi)) / (2.0 * jnp.pi) * N_ANGLE_BINS
    bin_i = jnp.round(bin_f).astype(jnp.int32) % N_ANGLE_BINS
    # per-keypoint bin row via ONE flat vmap of sliced-DMA rows
    bits = jax.vmap(
        lambda ba, bi: jax.lax.dynamic_slice(ba, (bi, 0), (1, ba.shape[1]))[0]
    )(bits_all, bin_i.reshape(-1))

    words = n_bits // 32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(
        bits.astype(jnp.uint32).reshape(b, k, words, 32) << shifts[None, None, None, :],
        axis=-1,
    ).astype(jnp.uint32)
    return Descriptors(bits=packed, angle=angle, valid=kp_valid)


def describe_orb(
    gray: jnp.ndarray,
    kps: Keypoints,
    n_bits: int = 256,
    pattern_radius: int = 13,
    blur_sigma: float = 2.0,
    orientation_radius: int = 15,
) -> Descriptors:
    """Single-image wrapper over describe_orb_batch (fixed-K keypoint set)."""
    d = describe_orb_batch(
        gray[None], kps.xy[None], kps.valid[None],
        n_bits=n_bits, pattern_radius=pattern_radius,
        blur_sigma=blur_sigma, orientation_radius=orientation_radius,
    )
    return Descriptors(bits=d.bits[0], angle=d.angle[0], valid=d.valid[0])
