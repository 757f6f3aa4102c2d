"""Point-to-point ICP in JAX.

Replaces Open3D's registration_icp as used by the reference multi-frame fusion
(depth_to_3d.py:651-665: threshold 0.5, 50 iters, fitness-gated accept). Nearest
neighbours are a brute-force chunked distance computation on the MXU (|a-b|^2 via
matmul); the aligning rigid transform comes from the SVD of the cross-covariance
(Kabsch). Fixed-size inputs: callers subsample clouds to `max_points`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class ICPResult(NamedTuple):
    R: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3]
    fitness: jnp.ndarray  # fraction of source points with a match within threshold
    inlier_rmse: jnp.ndarray


def _nearest(src: jnp.ndarray, dst: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each src point: (index of nearest dst point, squared distance)."""
    d2 = (
        jnp.sum(src * src, axis=1, keepdims=True)
        + jnp.sum(dst * dst, axis=1)[None, :]
        - 2.0 * src @ dst.T
    )
    idx = jnp.argmin(d2, axis=1)
    return idx, jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]


def _kabsch(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray):
    """Weighted rigid alignment src -> dst."""
    wsum = jnp.maximum(w.sum(), 1e-6)
    cs = (src * w[:, None]).sum(0) / wsum
    cd = (dst * w[:, None]).sum(0) / wsum
    x = (src - cs) * w[:, None]
    y = dst - cd
    h = x.T @ y
    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    D = jnp.diag(jnp.stack([1.0, 1.0, d]))
    R = vt.T @ D @ u.T
    t = cd - R @ cs
    return R, t


@functools.partial(jax.jit, static_argnums=(3,))
def icp_point_to_point(
    source: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float = 0.5,
    max_iterations: int = 50,
) -> ICPResult:
    """Align source [N, 3] to target [M, 3]. Returns the final rigid transform."""
    th2 = threshold * threshold

    def body(carry, _):
        R, t = carry
        moved = source @ R.T + t
        idx, d2 = _nearest(moved, target)
        w = (d2 < th2).astype(jnp.float32)
        Rd, td = _kabsch(moved, target[idx], w)
        return (Rd @ R, Rd @ t + td), None

    (R, t), _ = jax.lax.scan(body, (jnp.eye(3), jnp.zeros(3)), None, length=max_iterations)
    moved = source @ R.T + t
    _, d2 = _nearest(moved, target)
    inl = d2 < th2
    fitness = inl.mean()
    rmse = jnp.sqrt(jnp.maximum((d2 * inl).sum() / jnp.maximum(inl.sum(), 1), 0.0))
    return ICPResult(R=R, t=t, fitness=fitness, inlier_rmse=rmse)


def register_clouds(
    source: np.ndarray,
    target: np.ndarray,
    threshold: float = 0.5,
    max_iterations: int = 50,
    max_points: int = 4096,
    seed: int = 0,
) -> ICPResult:
    """Host wrapper: subsample both clouds to fixed size and run jitted ICP."""
    rng = np.random.RandomState(seed)

    def sub(x):
        if len(x) > max_points:
            return x[rng.choice(len(x), max_points, replace=False)]
        pad = max_points - len(x)
        if pad > 0 and len(x) > 0:
            x = np.concatenate([x, x[rng.choice(len(x), pad)]], axis=0)
        return x

    return icp_point_to_point(
        jnp.asarray(sub(source), jnp.float32),
        jnp.asarray(sub(target), jnp.float32),
        threshold,
        max_iterations,
    )
