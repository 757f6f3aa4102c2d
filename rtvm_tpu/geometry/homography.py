"""Homography estimation, validation and smoothing as pure jit functions.

TPU-native replacement for cv2.findHomography(RANSAC, reproj=2.0) (reference main.py:856)
plus the behavioral port of validate_homography / smooth_homography (main.py:761-834,
thresholds 50 px / 0.3 scale / 1e-3 perspective, 5-frame linspace(0.5, 1.0) window).

Instead of OpenCV's sequential data-dependent RANSAC loop, a fixed batch of hypotheses is
evaluated at once: vmap'd Hartley-normalized 4-point DLT solves (batched 8x8 linear
systems) + vectorized inlier counting + argmax, followed by masked least-squares
refinement (9x9 eigendecomposition) on the winner's inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) so importing this module never initializes a JAX backend
EYE3 = np.eye(3, dtype=np.float32)

# Small geometry matmuls MUST run at full f32 precision: the TPU default lowers
# f32 matmuls to bf16 MXU passes, which rounds homography entries (measured
# +-4 px on warped corner positions) and compounds across the per-frame
# H_old @ H_rel chain.
_P32 = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=_P32)


class RansacResult(NamedTuple):
    H: jnp.ndarray  # [3, 3] float32, maps src -> dst; identity on failure
    inliers: jnp.ndarray  # [K] bool
    num_inliers: jnp.ndarray  # int32
    ok: jnp.ndarray  # bool — enough matches and a usable model


def project(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply homography to [..., 2] points (cv2.perspectiveTransform equivalent)."""
    x, y = pts[..., 0], pts[..., 1]
    d = H[2, 0] * x + H[2, 1] * y + H[2, 2]
    d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
    u = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) / d
    v = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) / d
    return jnp.stack([u, v], axis=-1)


def _normalization(pts: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Hartley normalization transform for weighted points [K, 2], weights [K]."""
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    c = jnp.sum(pts * w[:, None], axis=0) / wsum
    dist = jnp.sqrt(jnp.sum((pts - c) ** 2, axis=-1))
    mean_dist = jnp.maximum(jnp.sum(dist * w) / wsum, 1e-9)
    s = jnp.sqrt(2.0) / mean_dist
    return jnp.array(
        [[s, 0.0, -s * c[0]], [0.0, s, -s * c[1]], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def _dlt_rows(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Build the [2K, 9] DLT constraint matrix for src -> dst correspondences."""
    x, y = src[:, 0], src[:, 1]
    u, v = dst[:, 0], dst[:, 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([x, y, o, z, z, z, -u * x, -u * y, -u], axis=-1)
    r2 = jnp.stack([z, z, z, x, y, o, -v * x, -v * y, -v], axis=-1)
    return jnp.concatenate([r1, r2], axis=0)  # [2K, 9]


def _square_to_quad(q: jnp.ndarray) -> jnp.ndarray:
    """Closed-form homography mapping the unit square (0,0),(1,0),(1,1),(0,1)
    to quad q [4, 2] (Heckbert's construction) — pure elementwise arithmetic,
    so a vmap over RANSAC hypotheses stays on the vector unit instead of
    lowering to XLA's batched-LU while-loops."""
    x0, y0 = q[0, 0], q[0, 1]
    x1, y1 = q[1, 0], q[1, 1]
    x2, y2 = q[2, 0], q[2, 1]
    x3, y3 = q[3, 0], q[3, 1]
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    dx3, dy3 = x0 - x1 + x2 - x3, y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    g = (dx3 * dy2 - dx2 * dy3) / den
    h = (dx1 * dy3 - dx3 * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    return jnp.stack([
        jnp.stack([a, b, x0]),
        jnp.stack([d, e, y0]),
        jnp.stack([g, h, jnp.float32(1.0)]),
    ])


def _adjugate3(m: jnp.ndarray) -> jnp.ndarray:
    """3x3 adjugate (inverse up to scale — enough for homographies)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    return jnp.stack([
        jnp.stack([e * i - f * h, c * h - b * i, b * f - c * e]),
        jnp.stack([f * g - d * i, a * i - c * g, c * d - a * f]),
        jnp.stack([d * h - e * g, b * g - a * h, a * e - b * d]),
    ])


def dlt_homography_4pt(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Exact homography from 4 correspondences: Hartley-normalize both sides
    (f32 conditioning), then H = S2Q(dst_n) @ adj(S2Q(src_n)) in closed form.
    Replaces the earlier batched 8x8 LU solve — XLA lowers batched LU to
    pivot-search while-loops that cost ~10 ms per window across the 16x256
    RANSAC hypotheses; the closed form is pure vectorized arithmetic."""
    ones4 = jnp.ones((4,), dtype=jnp.float32)
    t_src = _normalization(src, ones4)
    t_dst = _normalization(dst, ones4)
    sn = project(t_src, src)
    dn = project(t_dst, dst)
    hn = _mm(_square_to_quad(dn), _adjugate3(_square_to_quad(sn)))
    H = _mm(_mm(_adjugate3(t_dst), hn), t_src)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def dlt_homography_weighted(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Least-squares homography over weighted correspondences — the refinement step
    after RANSAC. Solves the normal equations with the normalized h33 pinned to 1
    (one 8x8 solve; equivalent to the eigenvector formulation for non-degenerate
    data and far cheaper than eigh on TPU)."""
    t_src = _normalization(src, w)
    t_dst = _normalization(dst, w)
    sn = project(t_src, src)
    dn = project(t_dst, dst)
    a = _dlt_rows(sn, dn)  # [2K, 9]
    ww = jnp.concatenate([w, w])[:, None]
    m = _mm((a * ww).T, a)  # [9, 9] normal matrix
    h8 = jnp.linalg.solve(m[:8, :8] + 1e-8 * jnp.eye(8), -m[:8, 8])
    hn = jnp.concatenate([h8, jnp.ones((1,), dtype=jnp.float32)]).reshape(3, 3)
    H = _mm(_mm(jnp.linalg.inv(t_dst), hn), t_src)
    return H / jnp.where(jnp.abs(H[2, 2]) < 1e-12, 1e-12, H[2, 2])


def _reproj_err2(H: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    p = project(H, src)
    return jnp.sum((p - dst) ** 2, axis=-1)


def ransac_homography(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    num_hypotheses: int = 512,
    reproj_threshold: float = 2.0,
    refine_iterations: int = 2,
    min_matches: int = 4,
) -> RansacResult:
    """Vectorized RANSAC: `num_hypotheses` simultaneous 4-point minimal solves, inlier
    voting over all correspondences, argmax, then iterative masked-DLT refinement.

    src/dst are fixed-size [K, 2] with a validity mask; invalid rows never vote and are
    never sampled. Deterministic given `key`.
    """
    k = src.shape[0]
    th2 = reproj_threshold * reproj_threshold
    n_valid = jnp.sum(valid.astype(jnp.int32))

    # --- sample 4 distinct valid indices per hypothesis (uniform via Gumbel top-k) ---
    u = jax.random.uniform(key, (num_hypotheses, k))
    scores = jnp.where(valid[None, :], u, -1.0)
    _, samp = jax.lax.top_k(scores, 4)  # [H, 4]

    def solve_one(idx):
        return dlt_homography_4pt(src[idx], dst[idx])

    Hs = jax.vmap(solve_one)(samp)  # [H, 3, 3]
    finite = jnp.all(jnp.isfinite(Hs), axis=(1, 2))
    Hs = jnp.where(finite[:, None, None], Hs, EYE3[None])

    errs = jax.vmap(lambda Hh: _reproj_err2(Hh, src, dst))(Hs)  # [H, K]
    votes = (errs < th2) & valid[None, :]
    counts = jnp.sum(votes, axis=1) * finite.astype(jnp.int32)
    best = jnp.argmax(counts)
    H = Hs[best]
    inl = votes[best]

    # --- refinement: weighted DLT over current inliers, re-vote, repeat ---
    def refine(carry, _):
        H, inl = carry
        w = inl.astype(jnp.float32)
        enough = jnp.sum(w) >= 4
        Hr = dlt_homography_weighted(src, dst, w)
        good = enough & jnp.all(jnp.isfinite(Hr))
        Hn = jnp.where(good, Hr, H)
        inl_n = (_reproj_err2(Hn, src, dst) < th2) & valid
        # keep the refit only if it did not lose inliers
        better = jnp.sum(inl_n) >= jnp.sum(inl)
        Hk = jnp.where(better, Hn, H)
        inl_k = jnp.where(better, inl_n, inl)
        return (Hk, inl_k), None

    (H, inl), _ = jax.lax.scan(refine, (H, inl), None, length=refine_iterations)

    ok = (n_valid >= min_matches) & (jnp.sum(inl) >= 4) & jnp.all(jnp.isfinite(H))
    H = jnp.where(ok, H, EYE3)
    return RansacResult(H=H, inliers=inl & ok, num_inliers=jnp.sum(inl & ok), ok=ok)


# ---------------------------------------------------------------------------
# Anti-shake validation + smoothing (behavioral port of main.py:761-834)
# ---------------------------------------------------------------------------


def validate_homography(
    H: jnp.ndarray,
    translation_threshold: float = 50.0,
    scale_threshold: float = 0.3,
    perspective_threshold: float = 1e-3,
) -> jnp.ndarray:
    """bool — True if the relative homography looks like sane inter-frame motion."""
    finite = jnp.all(jnp.isfinite(H))
    t = jnp.sqrt(H[0, 2] ** 2 + H[1, 2] ** 2)
    det = H[0, 0] * H[1, 1] - H[0, 1] * H[1, 0]
    scale = jnp.sqrt(jnp.maximum(det, 0.0))
    scale_ok = (det > 0) & (jnp.abs(scale - 1.0) <= scale_threshold)
    persp_ok = (jnp.abs(H[2, 0]) <= perspective_threshold) & (
        jnp.abs(H[2, 1]) <= perspective_threshold
    )
    return finite & (t <= translation_threshold) & scale_ok & persp_ok


def smoothing_weights(history_size: int = 5):
    """Per-slot weight table for each possible history fill count c = 1..S.

    Slot layout: hbuf[0] oldest ... hbuf[S-1] newest; with fill count c the populated
    slots are S-c..S-1 and get normalized linspace(0.5, 1.0, c) weights — exactly the
    reference's weighting (main.py:822-824). Returns [S, S] float32 table indexed by
    (c-1, slot).
    """
    import numpy as np

    s = history_size
    table = np.zeros((s, s), dtype=np.float32)
    for c in range(1, s + 1):
        w = np.linspace(0.5, 1.0, c)
        w = w / w.sum()
        table[c - 1, s - c :] = w
    return jnp.asarray(table)


def smooth_homography_step(
    hbuf: jnp.ndarray, hcount: jnp.ndarray, H: jnp.ndarray, weight_table: jnp.ndarray
):
    """Push H into the sliding history and return the weighted elementwise average.

    Mirrors reference semantics: with fewer than 2 entries the raw H is returned
    (main.py:818-820); the (possibly identity-replaced) H is always pushed.
    """
    size = hbuf.shape[0]
    hbuf = jnp.concatenate([hbuf[1:], H[None]], axis=0)
    hcount = jnp.minimum(hcount + 1, size)
    w = weight_table[hcount - 1]  # [S]
    h_avg = jnp.einsum("s,sij->ij", w, hbuf, precision=_P32)
    h_out = jnp.where(hcount < 2, H, h_avg)
    return hbuf, hcount, h_out


def transform_corners(w: int, h: int, H: jnp.ndarray) -> jnp.ndarray:
    """Warped positions of the frame corners (reference get_transformed_corners,
    main.py:929-950). Corner order: (0,0), (w,0), (w,h), (0,h)."""
    corners = jnp.array(
        [[0.0, 0.0], [float(w), 0.0], [float(w), float(h)], [0.0, float(h)]],
        dtype=jnp.float32,
    )
    return project(H, corners)
