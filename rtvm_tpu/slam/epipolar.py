"""Essential-matrix estimation + relative pose recovery as vectorized JAX ops.

TPU-native replacement for cv2.findEssentialMat(RANSAC, prob .999, th 1.0) +
cv2.recoverPose used by the reference visual odometry (slam.py:104-124). The
data-dependent RANSAC loop becomes a fixed batch of vmap'd 8-point solves with
Sampson-distance voting; recoverPose enumerates the 4 (R, t) decompositions and
scores cheirality by midpoint triangulation over all inliers at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class PoseResult(NamedTuple):
    R: jnp.ndarray  # [3, 3]
    t: jnp.ndarray  # [3] unit norm
    E: jnp.ndarray  # [3, 3]
    inliers: jnp.ndarray  # [K] bool
    num_inliers: jnp.ndarray  # int32
    ok: jnp.ndarray  # bool


def _normalize(pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized camera coordinates via K^-1."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(pts[..., 0] - cx) / fx, (pts[..., 1] - cy) / fy], axis=-1)


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """E from 8 normalized correspondences (x2^T E x1 = 0), rank-2 enforced."""
    a = jnp.stack(
        [
            x2[:, 0] * x1[:, 0], x2[:, 0] * x1[:, 1], x2[:, 0],
            x2[:, 1] * x1[:, 0], x2[:, 1] * x1[:, 1], x2[:, 1],
            x1[:, 0], x1[:, 1], jnp.ones_like(x1[:, 0]),
        ],
        axis=-1,
    )  # [8, 9]
    m = a.T @ a
    _, vecs = jnp.linalg.eigh(m)
    e = vecs[:, 0].reshape(3, 3)
    u, s, vt = jnp.linalg.svd(e)
    sbar = (s[0] + s[1]) / 2.0
    return u @ jnp.diag(jnp.array([sbar, sbar, 0.0])) @ vt


def _sampson2(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance in normalized coords for [K, 2] correspondences."""
    ones = jnp.ones_like(x1[:, :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)  # [K, 3]
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = p1 @ E.T  # [K, 3]
    Etx2 = p2 @ E
    num = jnp.sum(p2 * (p1 @ E.T), axis=-1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def _triangulate_depths(R, t, x1, x2):
    """Midpoint-method depths of points in both cameras for cheirality checks.
    Camera 1 at origin; camera 2: X2 = R X1 + t. Rays: d1 = [x1, 1], d2 = R^T [x2, 1]."""
    ones = jnp.ones_like(x1[:, :1])
    d1 = jnp.concatenate([x1, ones], axis=-1)
    d2 = (jnp.concatenate([x2, ones], axis=-1)) @ R  # = R^T d2_cam2, [K, 3]
    c2 = -R.T @ t  # camera-2 center in world
    # solve [d1, -d2] [a; b] = c2 in least squares per point (2 unknowns, 3 eqs)
    a11 = jnp.sum(d1 * d1, axis=-1)
    a12 = -jnp.sum(d1 * d2, axis=-1)
    a22 = jnp.sum(d2 * d2, axis=-1)
    b1 = jnp.sum(d1 * c2[None], axis=-1)
    b2 = -jnp.sum(d2 * c2[None], axis=-1)
    det = a11 * a22 - a12 * a12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    alpha = (a22 * b1 - a12 * b2) / det  # depth along d1 (camera 1)
    beta = (a11 * b2 - a12 * b1) / det  # depth along d2 (camera 2)
    return alpha, beta


def find_essential_and_pose(
    pts1: jnp.ndarray,
    pts2: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 256,
    threshold_px: float = 1.0,
    min_matches: int = 8,
) -> PoseResult:
    """Full findEssentialMat + recoverPose: pts1 (previous frame) -> pts2 (current).
    Returns R, t such that X2 = R X1 + t (camera motion), matching
    cv2.recoverPose conventions."""
    n = pts1.shape[0]
    x1 = _normalize(pts1, K)
    x2 = _normalize(pts2, K)
    f_mean = (K[0, 0] + K[1, 1]) / 2.0
    th2 = (threshold_px / f_mean) ** 2
    n_valid = jnp.sum(valid.astype(jnp.int32))

    u = jax.random.uniform(key, (num_hypotheses, n))
    scores = jnp.where(valid[None, :], u, -1.0)
    _, samp = jax.lax.top_k(scores, 8)  # [H, 8]

    Es = jax.vmap(lambda idx: _eight_point(x1[idx], x2[idx]))(samp)
    finite = jnp.all(jnp.isfinite(Es), axis=(1, 2))
    Es = jnp.where(finite[:, None, None], Es, jnp.eye(3)[None])
    errs = jax.vmap(lambda E: _sampson2(E, x1, x2))(Es)  # [H, K]
    votes = (errs < th2) & valid[None]
    counts = jnp.sum(votes, axis=1) * finite.astype(jnp.int32)
    best = jnp.argmax(counts)
    E = Es[best]
    inl = votes[best]

    # decompose E -> 4 candidate (R, t)
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tv = U[:, 2]
    cands = [(R1, tv), (R1, -tv), (R2, tv), (R2, -tv)]

    w = inl.astype(jnp.float32)

    def score(Rt):
        R, t = Rt
        alpha, beta = _triangulate_depths(R, t, x1, x2)
        return jnp.sum(((alpha > 0) & (beta > 0)).astype(jnp.float32) * w)

    scores4 = jnp.stack([score(c) for c in cands])
    bi = jnp.argmax(scores4)
    Rbest = jnp.stack([c[0] for c in cands])[bi]
    tbest = jnp.stack([c[1] for c in cands])[bi]

    ok = (n_valid >= min_matches) & (jnp.sum(inl) >= min_matches) & jnp.all(jnp.isfinite(E))
    return PoseResult(
        R=jnp.where(ok, Rbest, jnp.eye(3)),
        t=jnp.where(ok, tbest, jnp.zeros(3)),
        E=E,
        inliers=inl & ok,
        num_inliers=jnp.sum(inl & ok),
        ok=ok,
    )
