"""Separable filtering primitives built on lax.conv_general_dilated.

Replace the reference's cv2.GaussianBlur / Sobel / box-filter calls (main.py:893-894,
slam.py:1102-1110). Kernels are static (built at trace time) so XLA tiles them onto
the VPU/MXU with no dynamic shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def gaussian_kernel1d(sigma: float, radius: int | None = None) -> np.ndarray:
    """1-D Gaussian taps; matches cv2.getGaussianKernel for odd sizes."""
    if radius is None:
        radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _conv1d(img: jnp.ndarray, taps: np.ndarray, axis: int) -> jnp.ndarray:
    """Convolve a [..., H, W] image along `axis` (-1 or -2) with SAME edge-replicate padding
    (cv2's default BORDER_REFLECT_101 differs only in the outer `radius` pixels)."""
    r = (taps.shape[0] - 1) // 2
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode="edge")
    lead = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    x4 = x.reshape((-1, 1, h, w))
    if axis in (-2, img.ndim - 2):
        k = jnp.asarray(taps).reshape(1, 1, -1, 1)
    else:
        k = jnp.asarray(taps).reshape(1, 1, 1, -1)
    y = jax.lax.conv_general_dilated(
        x4, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y.reshape(lead + y.shape[-2:])


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None) -> jnp.ndarray:
    """Separable Gaussian blur of a [..., H, W] float image."""
    taps = gaussian_kernel1d(sigma, radius)
    return _conv1d(_conv1d(img, taps, axis=-1), taps, axis=-2)


def box_blur(img: jnp.ndarray, size: int) -> jnp.ndarray:
    taps = np.full((size,), 1.0 / size, dtype=np.float32)
    return _conv1d(_conv1d(img, taps, axis=-1), taps, axis=-2)


def sobel(img: jnp.ndarray):
    """Returns (gx, gy) using the 3x3 Sobel operator, matching cv2.Sobel(ksize=3)."""
    d = np.array([-1.0, 0.0, 1.0], dtype=np.float32)
    s = np.array([1.0, 2.0, 1.0], dtype=np.float32)
    gx = _conv1d(_conv1d(img, d, axis=-1), s, axis=-2)
    gy = _conv1d(_conv1d(img, s, axis=-1), d, axis=-2)
    return gx, gy


def _shift_minor(img: jnp.ndarray, off: int, axis: int, fill: float) -> jnp.ndarray:
    pad = [(0, 0)] * img.ndim
    pad[axis] = (max(off, 0), max(-off, 0))
    p = jnp.pad(img, pad, constant_values=fill)
    sl = [slice(None)] * img.ndim
    sl[axis] = slice(max(-off, 0), max(-off, 0) + img.shape[axis])
    return p[tuple(sl)]


def maxpool3x3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 max filter with SAME padding (separable shift-max: reduce_window
    lowers poorly on this backend)."""
    ninf = -jnp.inf if jnp.issubdtype(img.dtype, jnp.floating) else jnp.iinfo(img.dtype).min
    mx = jnp.maximum(
        img, jnp.maximum(_shift_minor(img, 1, -1, ninf), _shift_minor(img, -1, -1, ninf))
    )
    return jnp.maximum(
        mx, jnp.maximum(_shift_minor(mx, 1, -2, ninf), _shift_minor(mx, -1, -2, ninf))
    )


def minmaxpool3x3(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(max, min) 3x3 filters with SAME padding, sharing one edge-replicated
    pad and one set of shifted views (half the shift traffic of two separate
    pools). Edge-replication is exact for both: a border window re-reads an
    in-window value, which is idempotent under max/min."""
    pad = [(0, 0)] * (img.ndim - 2) + [(1, 1), (0, 0)]
    p = jnp.pad(img, pad, mode="edge")
    a = p[..., :-2, :]
    b = p[..., 1:-1, :]
    c = p[..., 2:, :]
    rmax = jnp.maximum(a, jnp.maximum(b, c))
    rmin = jnp.minimum(a, jnp.minimum(b, c))
    pad = [(0, 0)] * (img.ndim - 2) + [(0, 0), (1, 1)]
    pmax = jnp.pad(rmax, pad, mode="edge")
    pmin = jnp.pad(rmin, pad, mode="edge")
    mx = jnp.maximum(pmax[..., :-2], jnp.maximum(pmax[..., 1:-1], pmax[..., 2:]))
    mn = jnp.minimum(pmin[..., :-2], jnp.minimum(pmin[..., 1:-1], pmin[..., 2:]))
    return mx, mn


def dilate(mask: jnp.ndarray, size: int, iterations: int = 1) -> jnp.ndarray:
    """Binary/float dilation with a size x size rectangular structuring element
    (cv2.dilate equivalent)."""
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = jax.lax.reduce_window(
            out, -jnp.inf, jax.lax.max,
            window_dimensions=(1,) * (out.ndim - 2) + (size, size),
            window_strides=(1,) * out.ndim,
            padding="SAME",
        )
    return out


def erode(mask: jnp.ndarray, size: int, iterations: int = 1) -> jnp.ndarray:
    out = mask.astype(jnp.float32)
    for _ in range(iterations):
        out = jax.lax.reduce_window(
            out, jnp.inf, jax.lax.min,
            window_dimensions=(1,) * (out.ndim - 2) + (size, size),
            window_strides=(1,) * out.ndim,
            padding="SAME",
        )
    return out


def morph_open(mask: jnp.ndarray, size: int, iterations: int = 1) -> jnp.ndarray:
    return dilate(erode(mask, size, iterations), size, iterations)


def morph_close(mask: jnp.ndarray, size: int, iterations: int = 1) -> jnp.ndarray:
    return erode(dilate(mask, size, iterations), size, iterations)
