"""Oriented-BRIEF (rBRIEF) descriptors as batched TPU gathers.

TPU-native replacement for the descriptor stage of cv2.ORB_create(700) (reference
main.py:36). Orientation uses the intensity-centroid moment of a circular patch
(as in the ORB paper); the 256 binary tests use a fixed, seeded Gaussian test pattern
steered by the keypoint angle, sampled from a sigma=2 blurred image, and packed into
8 uint32 words so matching can run as XOR + popcount.

Design note: the descriptor is *self-consistent* (our detector matches our descriptor);
bit-for-bit parity with OpenCV's learned BRIEF pattern is neither needed nor desirable —
both sides of every match come from this code.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.features.fast import Keypoints
from rtvm_tpu.ops.filters import gaussian_blur
from rtvm_tpu.ops.sampling import nearest_sample


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


import functools as _functools


@_functools.lru_cache(maxsize=8)
def _moment_kernels(radius: int) -> np.ndarray:
    """[P, P, 1, 2] conv kernels computing (m10, m01) circular-patch moments."""
    d = np.arange(-radius, radius + 1, dtype=np.float32)
    circ = (d[:, None] ** 2 + d[None, :] ** 2) <= radius * radius
    kx = (circ * d[None, :]).astype(np.float32)
    ky = (circ * d[:, None]).astype(np.float32)
    return np.stack([kx, ky], axis=-1)[:, :, None, :]  # HWIO

def _patch_moments(gray: jnp.ndarray, kps: Keypoints, radius: int):
    """Intensity-centroid angle per keypoint.

    Computed as two full-image 31x31 convolutions (dx- and dy-weighted circular
    kernels — one MXU-friendly conv) followed by a K-point gather, instead of
    gathering K 31x31 patches (per-element gathers are the slow path on TPU)."""
    h, w = gray.shape
    k = jnp.asarray(_moment_kernels(radius))
    x = gray[None, :, :, None]
    mom = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1),
        padding=[(radius, radius), (radius, radius)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]  # [H, W, 2]
    cy = jnp.clip(kps.xy[:, 1].astype(jnp.int32), 0, h - 1)
    cx = jnp.clip(kps.xy[:, 0].astype(jnp.int32), 0, w - 1)
    m = mom[cy, cx]  # [K, 2]
    return jnp.arctan2(m[:, 1], m[:, 0])


def describe_orb(
    gray: jnp.ndarray,
    kps: Keypoints,
    n_bits: int = 256,
    pattern_radius: int = 13,
    blur_sigma: float = 2.0,
    orientation_radius: int = 15,
) -> Descriptors:
    """Compute steered-BRIEF descriptors for a fixed-K keypoint set on one [H, W] image."""
    angle = _patch_moments(gray, kps, orientation_radius)
    smooth = gaussian_blur(gray, blur_sigma)

    pat = jnp.asarray(brief_pattern(n_bits, pattern_radius))  # [N, 4]
    c, s = jnp.cos(angle), jnp.sin(angle)  # [K]
    kx = kps.xy[:, 0][:, None]
    ky = kps.xy[:, 1][:, None]

    def rot_x(px, py):
        return kx + c[:, None] * px[None, :] - s[:, None] * py[None, :]

    def rot_y(px, py):
        return ky + s[:, None] * px[None, :] + c[:, None] * py[None, :]

    x1 = rot_x(pat[:, 0], pat[:, 1])
    y1 = rot_y(pat[:, 0], pat[:, 1])
    x2 = rot_x(pat[:, 2], pat[:, 3])
    y2 = rot_y(pat[:, 2], pat[:, 3])

    i1 = nearest_sample(smooth, x1, y1)  # [K, N]
    i2 = nearest_sample(smooth, x2, y2)
    bits = (i1 < i2).astype(jnp.uint32)  # [K, N]

    words = n_bits // 32
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits.reshape(-1, words, 32) << shifts[None, None, :], axis=-1)
    packed = packed.astype(jnp.uint32)
    return Descriptors(bits=packed, angle=angle, valid=kps.valid)
