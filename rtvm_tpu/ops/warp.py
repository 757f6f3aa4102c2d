"""Fused perspective warp + distance-weighted blend into a persistent canvas.

TPU-native replacement for the reference's warp stage (main.py:861-927), which per frame
runs cv2.warpPerspective, two full-canvas L2 distance transforms, and two 31x31 Gaussian
blurs. Here a single fused XLA kernel inverse-warps the frame (bilinear gather), warps a
*static* edge-distance ramp alongside it, and blends against a persistent canvas weight
map — one pass over the canvas, no per-frame distance transforms, no host round-trips.

Feathering semantics: the reference weighs overlap pixels by
    w_new / (w_new + w_old)
where w_* are distances from the respective content edges. The frame's edge distance is a
static function of frame coordinates, so its warp is exact; the canvas side carries the
edge-distance weight at which each pixel was last written (a running maximum), which
converges to the same distance-to-union-edge profile in the interior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.sampling import bilinear_sample


def edge_distance_map(h: int, w: int, feather_radius: float = 32.0) -> np.ndarray:
    """[H, W] float32 ramp: 0 at the frame border rising linearly to 1 at
    `feather_radius` px inside (the static stand-in for distanceTransform(mask_new))."""
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    dy = np.minimum(ys + 1.0, h - ys)[:, None]
    dx = np.minimum(xs + 1.0, w - xs)[None, :]
    d = np.minimum(dy, dx)
    return np.minimum(d / feather_radius, 1.0).astype(np.float32)


def edge_distance_px(h: int, w: int) -> np.ndarray:
    """[H, W] float32 raw distance (px) to the frame border — the exact
    distanceTransform(full-frame mask) the reference computes for the new frame."""
    ys = np.arange(h, dtype=np.float32)
    xs = np.arange(w, dtype=np.float32)
    dy = np.minimum(ys + 1.0, h - ys)[:, None]
    dx = np.minimum(xs + 1.0, w - xs)[None, :]
    return np.minimum(dy, dx).astype(np.float32)


def _shift2d(d: jnp.ndarray, dy: int, dx: int, fill: float) -> jnp.ndarray:
    """Non-wrapping 2D shift (pad + slice; static offsets)."""
    h, w = d.shape
    py = (max(dy, 0), max(-dy, 0))
    px = (max(dx, 0), max(-dx, 0))
    p = jnp.pad(d, (py, px), constant_values=fill)
    return p[py[1] : py[1] + h, px[1] : px[1] + w]


CELL_PX = 4  # coarse union-occupancy cell size (px); 4px + exact EDT + half-cell
# bias correction measures ~48 dB blend fidelity vs the cv2 distance transform
# (8px octagonal chamfer measured ~40 dB — the round-1 PSNR bottleneck)


def coarse_union_distance(union: jnp.ndarray, cell_px: float = float(CELL_PX)) -> jnp.ndarray:
    """Distance (in pixels, cv2 chamfer-3x4 metric) from each cell of a coarse
    union-occupancy grid to the nearest non-union cell — the TPU counterpart of
    cv2.distanceTransform of the growing mosaic mask (reference main.py:888-890).

    Felzenszwalb-style separable transform, shaped for the TPU:
      1. rows: 1D distance to the nearest non-union cell along each row via
         min-plus relaxation with descending power-of-two shifts (exact in 1D);
      2. columns: D[y, x] = min_v chamfer(drow[v, x], y - v) as one broadcast
         combine + min-reduce over v (XLA fuses it; no gather, no sort). The
         separable form stays exact under the chamfer point metric because it
         is monotone in the per-row horizontal distance.
    """
    gh, gw = union.shape
    big = jnp.float32(4.0 * max(gh, gw))
    d = jnp.where(union, big, 0.0)
    k = 1
    while k * 2 < gw:
        k *= 2
    while k >= 1:  # exact 1D row distance (any n is a sum of distinct powers of 2)
        d = jnp.minimum(d, _shift2d(d, 0, k, 0.0) + k)
        d = jnp.minimum(d, _shift2d(d, 0, -k, 0.0) + k)
        k //= 2
    f = jnp.minimum(d, big)  # [Gh, Gw] row distances (cells)
    v = jnp.arange(gh, dtype=jnp.float32)
    dy = jnp.abs(v[:, None] - v[None, :])  # [Gh_y, Gh_v]
    comb = _chamfer_pt(f[None, :, :], dy[:, :, None])  # [Gh_y, Gh_v, Gw]
    return jnp.min(comb, axis=1) * cell_px


class BlendedCanvas(NamedTuple):
    canvas: jnp.ndarray  # [Hc, Wc, 3] float32
    weight: jnp.ndarray  # [Hc, Wc] float32 — feather weight at last write (0 = empty)


# ---------------------------------------------------------------------------
# Two-pass (Catmull-Smith) MXU warp — the TPU fast path.
#
# Per-element gathers cost ~8 ms per 1M points on TPU, which made the naive
# gather warp ~40-90 ms/frame. This formulation uses only TPU-fast primitives:
#   * per-row integer shifts  -> vmap'd dynamic_slice (sliced-DMA path, ~0.3 ms)
#   * per-row fractional shift -> 2-tap elementwise lerp (~free)
#   * residual monotonic resample -> per-row-block banded interpolation matrix
#     built elementwise and applied as one batched MXU matmul (~free)
# Pass 1 resamples each frame row horizontally to its final canvas column
# positions; pass 2 (on the transpose) resamples each canvas column vertically.
# Positions are the exact Catmull-Smith rational maps, evaluated per row-block
# center; the within-block position error is O(h20,h21 x block) — sub-0.1px for
# the perspective magnitudes the homography validator admits.
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_N_TAPS = 5  # tap window: s0 + {0..4}; covers within-block position deviation <= 1px


def _resample_rows(rows: jnp.ndarray, pos: jnp.ndarray, wout: int, wpad: int, n_blocks: int) -> jnp.ndarray:
    """Resample each row of channel-major `rows` [C, R, Win] at float positions
    pos [R, wout] (monotonically increasing along axis 1). Linear interpolation;
    positions outside [0, Win-1] produce zeros. Returns [C, R, wout].

    EXACT bilinear, structured for the MXU:
      * per row i: integer anchor n_i = floor(pos[i, 0]) applied as a dynamic_slice
        (the sliced-DMA fast path — needs the padded source width 128-aligned,
        hence the padding arithmetic);
      * per row-BLOCK: integer tap bases s0[b, j] = floor(block-center residual) - 1,
        turned into a 0/1 column-selection matrix -> one MXU matmul over _N_TAPS
        x-shifted copies of the data stacked on the channel axis (0/1 entries are
        exact in bf16);
      * per (row, column): the true position p[i, j] = pos[i, j] - n_i is compared
        against each tap elementwise, so the 2-tap hat weights are EXACT per row —
        the block approximation only picks the 5-tap *window*, never the weights.
    The window absorbs within-block position deviation up to ~1px; deviation comes
    only from the perspective cross-terms (`two_pass_regime_ok` bounds it — affine
    H has zero deviation). Round 1 used block-center weights + a separate per-row
    fractional lerp: the chained lerps and ~1-2px block deviation capped single-warp
    fidelity at ~34-37 dB vs cv2; this form measures at the bf16 floor (>~55 dB)."""
    c, r, win = rows.shape
    assert r % n_blocks == 0, (r, n_blocks)
    rb = r // n_blocks

    ell = wpad + 128  # slice length, 128-aligned (>= wpad + _N_TAPS tap lookahead)
    pad_left = _round_up(int(1.45 * wout) + 24, 128)
    wtot = _round_up(win + pad_left + ell + 16, 128)
    pad_right = wtot - win - pad_left

    n_raw = jnp.floor(pos[:, 0])  # [R]
    n = jnp.clip(n_raw, -pad_left + 1, win + 4)
    row_ok = (n_raw == n) & jnp.isfinite(n_raw)
    n = jnp.where(jnp.isfinite(n), n, 0.0)

    padded = jnp.pad(rows, ((0, 0), (0, 0), (pad_left, pad_right)))
    starts = (pad_left + n).astype(jnp.int32)

    def slice_one(rows_r, s0):
        # rows_r: [C, Win_tot] — all channels of one row
        return jax.lax.dynamic_slice(rows_r, (0, s0), (c, ell))

    sh = jax.vmap(slice_one, in_axes=(1, 0), out_axes=0)(padded, starts)  # [R, C, ell]
    sh = sh * row_ok[:, None, None]

    # Exact per-row residual positions; the tap base is the floor of the BLOCK
    # MINIMUM (per-row fractional anchors spread p by up to 1, plus the
    # perspective deviation), so every row's 2 live taps sit inside the window
    # whenever the within-block deviation is <= (_N_TAPS - 3) / 2 = 1px.
    p = pos - n[:, None]  # [R, wout], p[i, 0] in [0, 1)
    d = p.reshape(n_blocks, rb, wout).min(axis=1)  # [n_blocks, wout]
    s0 = jnp.floor(jnp.clip(d, -4.0, wpad + 2.0))  # [n_blocks, wout]

    # 0/1 column-selection matrix for tap 0; taps 1.._N_TAPS-1 reuse it against
    # x-shifted data (T_t[i, j] = sh[i, s0_j + t]).
    xs = jax.lax.broadcasted_iota(jnp.float32, (n_blocks, wpad, wout), 1)
    sel = (xs == s0[:, None, :]).astype(jnp.bfloat16)

    # Stack the shifted copies on the channel axis -> one MXU matmul.
    g3 = jnp.concatenate(
        [sh[:, :, t : wpad + t] for t in range(_N_TAPS)], axis=1
    )  # [R, T*C, wpad]
    blocks = g3.reshape(n_blocks, rb, _N_TAPS * c, wpad)
    taps = jnp.einsum(
        "brcx,bxj->brcj",
        blocks.astype(jnp.bfloat16),
        sel,
        preferred_element_type=jnp.float32,
    ).reshape(r, _N_TAPS, c, wout)

    # Exact per-(row, column) hat weights: t_pos = p - s0 is the true position
    # relative to the tap window.
    t_pos = p - jnp.repeat(s0, rb, axis=0)  # [R, wout]
    out = jnp.zeros((r, c, wout), jnp.float32)
    for t in range(_N_TAPS):
        a = jnp.maximum(0.0, 1.0 - jnp.abs(t_pos - t))[:, None]
        out = out + a * taps[:, t]
    return jnp.moveaxis(out, 1, 0)  # [C, R, wout]


def _pass1_positions(H: jnp.ndarray, hf: int, wc: int) -> jnp.ndarray:
    """u(y, X): source column in frame row y for canvas column X (exact rational)."""
    y = jnp.arange(hf, dtype=jnp.float32)[:, None]
    X = jnp.arange(wc, dtype=jnp.float32)[None, :]
    num = (H[0, 1] * y + H[0, 2]) - X * (H[2, 1] * y + H[2, 2])
    den = H[2, 0] * X - H[0, 0]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    return num / den


def _pass2_positions(G: jnp.ndarray, wc: int, hc: int) -> jnp.ndarray:
    """v(X, Y): source frame row for canvas pixel (X, Y), from the inverse map G."""
    X = jnp.arange(wc, dtype=jnp.float32)[:, None]
    Y = jnp.arange(hc, dtype=jnp.float32)[None, :]
    den = G[2, 0] * X + G[2, 1] * Y + G[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    return (G[1, 0] * X + G[1, 1] * Y + G[1, 2]) / den


def _pad_rows_to(x: jnp.ndarray, mult: int):
    r = x.shape[0]
    target = _round_up(r, mult)
    if target != r:
        pad = [(0, target - r)] + [(0, 0)] * (x.ndim - 1)
        x = jnp.pad(x, pad)
    return x, r


def _pad_rows_cm(x: jnp.ndarray, mult: int):
    r = x.shape[1]
    target = _round_up(r, mult)
    if target != r:
        x = jnp.pad(x, ((0, 0), (0, target - r), (0, 0)))
    return x


def warp_two_pass(stack: jnp.ndarray, H: jnp.ndarray, out_h: int, out_w: int,
                  rb: int = 16) -> jnp.ndarray:
    """Warp a channel-major [C, Hf, Wf] stack by homography H (frame -> output
    coords) onto a [C, out_h, out_w] grid using the two-pass MXU formulation.
    Valid only within the regime checked by `two_pass_regime_ok`; callers select
    the gather fallback otherwise. `rb` is the row-block size: the 5-tap window
    stays exact while the perspective cross-term deviates positions by < 1px
    across rb/2 rows (two_pass_regime_ok enforces this for the same rb)."""
    c, hf, wf = stack.shape
    G = jnp.linalg.inv(H)

    # Pass 1: horizontal — frame rows to canvas columns.
    wpad1 = _round_up(int(1.45 * out_w) + 16, 128)
    pos1 = _pass1_positions(H, hf, out_w)  # [Hf, Wc]
    rows1 = _pad_rows_cm(stack, rb)
    pos1p, _ = _pad_rows_to(pos1, rb)
    t = _resample_rows(rows1, pos1p, out_w, wpad1, rows1.shape[1] // rb)[:, :hf]  # [C, Hf, Wc]

    # Pass 2: vertical — canvas columns resampled down the frame rows.
    tt = jnp.swapaxes(t, 1, 2)  # [C, Wc, Hf]
    wpad2 = _round_up(int(1.45 * out_h) + 16, 128)
    pos2 = _pass2_positions(G, out_w, out_h)  # [Wc, Hc]
    rows2 = _pad_rows_cm(tt, rb)
    pos2p, _ = _pad_rows_to(pos2, rb)
    out_t = _resample_rows(rows2, pos2p, out_h, wpad2, rows2.shape[1] // rb)[:, :out_w]  # [C, Wc, Hc]
    return jnp.swapaxes(out_t, 1, 2)  # [C, Hc, Wc]


def two_pass_regime_ok(H: jnp.ndarray, out_h: int, out_w: int, rb: int = 16) -> jnp.ndarray:
    """True when the two-pass decomposition is exact-within-window and inside the
    static padding bounds: small perspective, positive bounded pass slopes
    (|rotation| < ~40deg, scale within ~[0.72, 1.4]), and within-row-block position
    deviation (the perspective cross-term over rb/2 rows) under 1px so the 5-tap
    resample window never truncates a live tap."""
    G = jnp.linalg.inv(H)
    persp_ok = (
        (jnp.abs(H[2, 0]) < 2e-4)
        & (jnp.abs(H[2, 1]) < 2e-4)
        & (jnp.abs(G[2, 0]) < 2e-4)
        & (jnp.abs(G[2, 1]) < 2e-4)
    )

    # Within-block deviation, evaluated in closed form at the grid corners.
    def u(y, X):  # pass-1 source column (exact rational, _pass1_positions)
        num = (H[0, 1] * y + H[0, 2]) - X * (H[2, 1] * y + H[2, 2])
        den = H[2, 0] * X - H[0, 0]
        return num / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)

    def v(X, Y):  # pass-2 source row (exact rational, _pass2_positions)
        den = G[2, 0] * X + G[2, 1] * Y + G[2, 2]
        return (G[1, 0] * X + G[1, 1] * Y + G[1, 2]) / jnp.where(
            jnp.abs(den) < 1e-9, 1e-9, den
        )

    d1 = rb / 2.0
    dev1 = jnp.maximum(
        *[
            jnp.abs((u(y + d1, out_w) - u(y, out_w)) - (u(y + d1, 0.0) - u(y, 0.0)))
            for y in (0.0, float(out_h))
        ]
    )
    dev2 = jnp.maximum(
        *[
            jnp.abs((v(X + d1, out_h) - v(X, out_h)) - (v(X + d1, 0.0) - v(X, 0.0)))
            for X in (0.0, float(out_w))
        ]
    )
    dev_ok = (dev1 < 0.99) & (dev2 < 0.99)
    persp_ok = persp_ok & dev_ok
    # pass-1 slope du/dX ~ (h21 y + h22) / (h00 - h20 X): sample at corners
    s1a = (H[2, 2]) / jnp.where(jnp.abs(H[0, 0]) < 1e-9, 1e-9, H[0, 0])
    s1b = (H[2, 1] * out_h + H[2, 2]) / jnp.where(jnp.abs(H[0, 0] - H[2, 0] * out_w) < 1e-9, 1e-9, H[0, 0] - H[2, 0] * out_w)
    # pass-2 slope dv/dY ~ g11 / den
    s2a = G[1, 1] / jnp.where(jnp.abs(G[2, 2]) < 1e-9, 1e-9, G[2, 2])
    s2b = G[1, 1] / jnp.where(jnp.abs(G[2, 0] * out_w + G[2, 2]) < 1e-9, 1e-9, G[2, 0] * out_w + G[2, 2])
    lo, hi = 0.72, 1.40
    slope_ok = (
        (s1a > lo) & (s1a < hi) & (s1b > lo) & (s1b < hi)
        & (s2a > lo) & (s2a < hi) & (s2b > lo) & (s2b < hi)
    )
    return jnp.all(jnp.isfinite(H)) & jnp.all(jnp.isfinite(G)) & persp_ok & slope_ok


def pallas_regime_ok(H: jnp.ndarray, out_h: int, out_w: int, hf: int, wf: int) -> jnp.ndarray:
    """Regime for the Pallas fused warp kernel (ops/pallas_warp.py): the XLA
    two-pass regime PLUS a shear bound — the kernel shares one 5-tap window per
    RB-row block with no per-row anchor, so |du/dy| (pass 1) and |dv/dX|
    (pass 2) must keep positions within ~3px across a block."""
    from rtvm_tpu.ops import pallas_warp as PW

    base = two_pass_regime_ok(H, out_h, out_w)
    G = jnp.linalg.inv(H)

    def u(y, X):
        num = (H[0, 1] * y + H[0, 2]) - X * (H[2, 1] * y + H[2, 2])
        den = H[2, 0] * X - H[0, 0]
        return num / jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)

    def v(X, Y):
        den = G[2, 0] * X + G[2, 1] * Y + G[2, 2]
        return (G[1, 0] * X + G[1, 1] * Y + G[1, 2]) / jnp.where(
            jnp.abs(den) < 1e-9, 1e-9, den
        )

    shear_max = 2.5 / (PW.RB - 1)
    du_dy = jnp.max(jnp.stack(
        [jnp.abs(u(y + 1.0, X) - u(y, X)) for y in (0.0, float(hf)) for X in (0.0, float(out_w))]
    ))
    dv_dx = jnp.max(jnp.stack(
        [jnp.abs(v(X + 1.0, Y) - v(X, Y)) for X in (0.0, float(out_w)) for Y in (0.0, float(out_h))]
    ))
    return base & (du_dy < shear_max) & (dv_dx < shear_max)


# cv2.GaussianBlur((31, 31), sigmaX=0) resolves to sigma 5.0 (the reference's
# weight smoothing, main.py:894-898); radius 15 -> exactly 31 taps.
BLEND_SMOOTH_SIGMA = 5.0
BLEND_SMOOTH_RADIUS = 15


def blend_weights_smoothed(w_new: jnp.ndarray, w_old: jnp.ndarray):
    """Reference blend weights (main.py:888-906): normalized distance weights
    smoothed with a 31x31 Gaussian, used WITHOUT renormalizing — near the
    mask-union boundary their sum dips below 1 (the blur leaks weight outside
    the union), slightly darkening the overlap there; that is reference
    behavior, reproduced deliberately (the r5 exact-blend oracle measured
    36 dB against the unsmoothed blend — the smoothing is visible, not
    cosmetic). w_old_smooth is computed as blur(union_indicator) - blur(alpha)
    = blur(1 - alpha inside the union), saving the third blur.

    Depends ONLY on (w_new, w_old) — not on pixel content — so the stitcher
    vmaps this over the whole window outside the blend scan (w_old comes from
    the batched cumulative-OR union distances), leaving the scan body pure
    elementwise. Returns (alpha_s, beta_s)."""
    from rtvm_tpu.ops.filters import gaussian_blur

    s = w_new + w_old + 1e-6
    alpha = w_new / s
    region = ((w_new > 0.0) | (w_old > 0.0)).astype(jnp.float32)
    alpha_s = gaussian_blur(alpha, BLEND_SMOOTH_SIGMA, BLEND_SMOOTH_RADIUS)
    beta_s = gaussian_blur(region, BLEND_SMOOTH_SIGMA, BLEND_SMOOTH_RADIUS) - alpha_s
    return alpha_s, beta_s


def blend_apply_cm(canvas, new_px, w_new, w_old, alpha_s, beta_s) -> jnp.ndarray:
    """Elementwise composite with precomputed smoothed weights: blend in the
    overlap, hard-copy new-only, keep old elsewhere (main.py:902-906)."""
    has_new = w_new > 0.0
    has_old = w_old > 0.0
    blended = alpha_s[None] * new_px + beta_s[None] * canvas
    return jnp.where(
        (has_new & has_old)[None],
        blended,
        jnp.where(has_new[None], new_px, canvas),
    )


def _blend_cm(canvas, canvas_weight, new_px, w_new) -> BlendedCanvas:
    """Feathered composite (channel-major [3, Hc, Wc] canvas) of a warped frame
    (new_px [3, Hc, Wc], weight w_new [Hc, Wc], 0 = no content). Single-frame
    form of blend_weights_smoothed + blend_apply_cm (see those for the
    reference semantics)."""
    alpha_s, beta_s = blend_weights_smoothed(w_new, canvas_weight)
    out = blend_apply_cm(canvas, new_px, w_new, canvas_weight, alpha_s, beta_s)
    return BlendedCanvas(canvas=out, weight=jnp.maximum(canvas_weight, w_new))


def _warp_gather_cm(stack: jnp.ndarray, H: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """General gather-based perspective warp of a channel-major stack [C, Hf, Wf]
    (the out-of-regime fallback — ~10x slower than the two-pass path)."""
    c, hf, wf = stack.shape
    hinv = jnp.linalg.inv(H)
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    den = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / den
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / den
    inb = (sx >= 0.0) & (sx <= wf - 1.0) & (sy >= 0.0) & (sy <= hf - 1.0) & (den > 0.0)
    out = jax.vmap(lambda ch: bilinear_sample(ch, sx, sy))(stack)
    return jnp.where(inb[None], out, 0.0)


# cv2.distanceTransform(DIST_L2, maskSize=3) is a 3x4 chamfer, not exact
# Euclid: axis steps cost A, diagonal steps cost B. Matching the metric (not
# just the geometry) is worth ~2 dB of blend fidelity vs the OpenCV oracle.
CHAMFER_A = 0.955
CHAMFER_B = 1.3693


def _chamfer_pt(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """cv2 chamfer-3x4 point metric: A*(max-min) + B*min of |dx|,|dy|."""
    ax, ay = jnp.abs(dx), jnp.abs(dy)
    big, sml = jnp.maximum(ax, ay), jnp.minimum(ax, ay)
    return CHAMFER_A * (big - sml) + CHAMFER_B * sml


def _seg_dist(px, py, x0, y0, x1, y1, valid):
    """Chamfer distance from every grid point (px, py) to the segment
    (x0,y0)-(x1,y1); +inf where `valid` is False. Endpoint scalars are traced.

    Where the Euclidean foot falls inside the segment the chamfer distance to
    the segment equals the chamfer distance to its LINE, r / h(n) with h the
    support function of the chamfer unit octagon in the normal direction
    (minimizing the point metric at the perpendicular foot instead would
    overestimate by up to ~4.5%); off the ends it is the point metric to the
    nearest endpoint."""
    ex, ey = x1 - x0, y1 - y0
    l2 = ex * ex + ey * ey
    safe_l2 = jnp.maximum(l2, 1e-12)
    t = ((px - x0) * ex + (py - y0) * ey) / safe_l2
    tc = jnp.clip(t, 0.0, 1.0)
    d_end = _chamfer_pt(px - (x0 + tc * ex), py - (y0 + tc * ey))
    # line formula: |signed distance| / h_octagon(unit normal)
    inv_len = jax.lax.rsqrt(safe_l2)
    nx, ny = ey * inv_len, -ex * inv_len
    anx, any_ = jnp.abs(nx), jnp.abs(ny)
    h_oct = jnp.maximum(jnp.maximum(anx, any_) / CHAMFER_A, (anx + any_) / CHAMFER_B)
    d_line = jnp.abs(nx * (px - x0) + ny * (py - y0)) / jnp.maximum(h_oct, 1e-12)
    inside_seg = (t > 0.0) & (t < 1.0) & (l2 > 1e-12)
    d = jnp.where(inside_seg, d_line, d_end)
    return jnp.where(valid, d, jnp.inf)


def frame_weight_params(H: jnp.ndarray, hf: int, wf: int, hc: int, wc: int) -> tuple:
    """Scalar geometry for analytic_frame_weight: the 20 candidate segments and
    4 inside half-planes of the clipped warped quad, as a tuple of small
    arrays. ~300 scalar ops — on the TPU these run on the (slow) scalar core,
    so the stitcher vmaps THIS over the whole frame window outside the paint
    scan (measured ~0.5 ms/frame when left inside the scan body) and feeds the
    stacked results through the scan.

    The INTER_LINEAR mask is nonzero wherever the inverse-mapped sample point
    falls inside the SOURCE rect expanded by one source pixel (the bilinear
    support), so the quad is built from the expanded source corners
    (-1..wf, -1..hf) mapped through H, plus a half-pixel outward inflation for
    the mean raster phase (zero pixel centers sit up to 1 px outside the
    continuous boundary). Modeling the expansion in SOURCE space matters under
    scale/rotation, and modeling it as geometry (not a scalar +1 on the
    result) matters at canvas borders: a quad edge within a pixel of the
    border contributes no zero pixels at all."""
    # expanded source corners -> canvas (bilinear support: source in (-1, wf))
    corners = jnp.array(
        [[-1.0, -1.0, 1.0], [float(wf), -1.0, 1.0], [float(wf), float(hf), 1.0], [-1.0, float(hf), 1.0]],
        jnp.float32,
    )
    # full f32 precision: the TPU default bf16 matmul rounds corners by +-4 px
    ch = jnp.matmul(H, corners.T, precision=jax.lax.Precision.HIGHEST).T  # [4, 3]
    cq = ch[:, :2] / ch[:, 2:3]  # [4, 2] canvas xy
    cen = jnp.mean(cq, axis=0)

    wlim, hlim = jnp.float32(wc - 1.0), jnp.float32(hc - 1.0)
    rect = jnp.array([[0.0, 0.0], [wc - 1.0, 0.0], [wc - 1.0, hc - 1.0], [0.0, hc - 1.0]], jnp.float32)

    # --- scalar geometry: build all 20 candidate segments (4 edges x [chord +
    # 4 clipped canvas sides]) as stacked endpoint/validity vectors, then one
    # vectorized grid evaluation. Keeping the grid math in a single stacked op
    # (instead of 20 separate elementwise chains) cuts XLA compile time ~6x.
    seg_x0, seg_y0, seg_x1, seg_y1, seg_ok_l = [], [], [], [], []
    ins_nx, ins_ny, ins_px, ins_py = [], [], [], []
    for i in range(4):
        p0, p1 = cq[i], cq[(i + 1) % 4]
        e = p1 - p0
        # outward normal of edge i (away from the quad centroid)
        n = jnp.array([e[1], -e[0]])
        n = n / jnp.maximum(jnp.linalg.norm(n), 1e-12)
        nd = n[0] * (cen[0] - p0[0]) + n[1] * (cen[1] - p0[1])
        n = jnp.where(nd > 0, -n, n)
        p0 = p0 + 0.5 * n  # mean raster-phase inflation (see docstring)
        ins_nx.append(n[0]); ins_ny.append(n[1]); ins_px.append(p0[0]); ins_py.append(p0[1])

        # chord: edge LINE clipped to the canvas rect (Liang-Barsky, branch-free)
        def axis_range(o, d, lim):
            ta = (0.0 - o) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            tb = (lim - o) / jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
            lo, hi = jnp.minimum(ta, tb), jnp.maximum(ta, tb)
            par = jnp.abs(d) < 1e-12  # parallel: inside iff origin within bounds
            ok = (o >= 0.0) & (o <= lim)
            lo = jnp.where(par, jnp.where(ok, -jnp.inf, jnp.inf), lo)
            hi = jnp.where(par, jnp.where(ok, jnp.inf, -jnp.inf), hi)
            return lo, hi

        lx, hx = axis_range(p0[0], e[0], wlim)
        ly, hy = axis_range(p0[1], e[1], hlim)
        t0 = jnp.maximum(lx, ly)
        t1 = jnp.minimum(hx, hy)
        t0c = jnp.clip(t0, -1e6, 1e6)
        t1c = jnp.clip(t1, -1e6, 1e6)
        seg_x0.append(p0[0] + t0c * e[0]); seg_y0.append(p0[1] + t0c * e[1])
        seg_x1.append(p0[0] + t1c * e[0]); seg_y1.append(p0[1] + t1c * e[1])
        seg_ok_l.append(t1 >= t0)
        # canvas sides clipped to the OUTSIDE half-plane of edge i
        for j in range(4):
            r0, r1 = rect[j], rect[(j + 1) % 4]
            # outside(s) = n.(r0 + s*(r1-r0) - p0) >= 0  ->  a + s*b >= 0
            a = n[0] * (r0[0] - p0[0]) + n[1] * (r0[1] - p0[1])
            bcoef = n[0] * (r1[0] - r0[0]) + n[1] * (r1[1] - r0[1])
            safe_b = jnp.where(jnp.abs(bcoef) < 1e-12, 1e-12, bcoef)
            s_cross = -a / safe_b
            s0 = jnp.where(bcoef >= 0, jnp.maximum(0.0, s_cross), 0.0)
            s1 = jnp.where(bcoef >= 0, 1.0, jnp.minimum(1.0, s_cross))
            par = jnp.abs(bcoef) < 1e-12
            s0 = jnp.where(par, jnp.where(a >= 0, 0.0, 1.0), s0)
            s1 = jnp.where(par, jnp.where(a >= 0, 1.0, 0.0), s1)
            seg_x0.append(r0[0] + s0 * (r1[0] - r0[0])); seg_y0.append(r0[1] + s0 * (r1[1] - r0[1]))
            seg_x1.append(r0[0] + s1 * (r1[0] - r0[0])); seg_y1.append(r0[1] + s1 * (r1[1] - r0[1]))
            seg_ok_l.append(s1 >= s0)

    segs = jnp.stack(
        [jnp.stack(seg_x0), jnp.stack(seg_y0), jnp.stack(seg_x1), jnp.stack(seg_y1)]
    )  # [4, 20]
    sok = jnp.stack(seg_ok_l)  # [20]
    planes = jnp.stack(
        [jnp.stack(ins_nx), jnp.stack(ins_ny), jnp.stack(ins_px), jnp.stack(ins_py)]
    )  # [4, 4]
    ok_orient = jnp.all(ch[:, 2] > 0.0)  # all corner denominators > 0 (no wrap)
    return segs, sok, planes, ok_orient


def frame_weight_eval(params: tuple, hc: int, wc: int) -> jnp.ndarray:
    """Grid evaluation of the analytic frame weight from frame_weight_params
    output (see analytic_frame_weight for the full semantics)."""
    segs, sok_v, planes, ok_orient = params
    ys = jnp.arange(hc, dtype=jnp.float32)[:, None]
    xs = jnp.arange(wc, dtype=jnp.float32)[None, :]
    S = segs.shape[1]
    sx0 = segs[0].reshape(S, 1, 1)
    sy0 = segs[1].reshape(S, 1, 1)
    sx1 = segs[2].reshape(S, 1, 1)
    sy1 = segs[3].reshape(S, 1, 1)
    sok = sok_v.reshape(S, 1, 1)
    inx = planes[0].reshape(4, 1, 1)
    iny = planes[1].reshape(4, 1, 1)
    ipx = planes[2].reshape(4, 1, 1)
    ipy = planes[3].reshape(4, 1, 1)

    # The 20-segment evaluation at full canvas resolution costs ~0.65 ms/frame
    # on the chip; the distance field is piecewise linear, so it is evaluated
    # on a stride-2 grid as a SIGNED field (negative outside the quad — linear
    # across the boundary, so bilinear upsampling keeps the zero crossing
    # exactly on the edge) and upsampled; only the inside mask runs full-res.
    st = 2
    gh, gw = -(-hc // st), -(-wc // st)
    ys_lo = (jnp.arange(gh, dtype=jnp.float32) * st)[:, None]
    xs_lo = (jnp.arange(gw, dtype=jnp.float32) * st)[None, :]
    dmin_lo = jnp.min(_seg_dist(xs_lo[None], ys_lo[None], sx0, sy0, sx1, sy1, sok), axis=0)
    dmin_lo = jnp.where(jnp.isfinite(dmin_lo), dmin_lo, 4.0 * (hc + wc))
    inside_lo = jnp.all(-(inx * (xs_lo[None] - ipx) + iny * (ys_lo[None] - ipy)) > 0.0, axis=0)
    signed_lo = jnp.where(inside_lo, dmin_lo, -dmin_lo)
    # exact grid-aligned 2x upsample (jax.image.resize uses half-pixel centers,
    # which would shift the field by 0.5 px): even taps copy, odd taps average
    a = signed_lo
    a = jnp.stack([a, 0.5 * (a + jnp.concatenate([a[1:], a[-1:]], 0))], axis=1).reshape(gh * st, gw)
    a = jnp.stack([a, 0.5 * (a + jnp.concatenate([a[:, 1:], a[:, -1:]], 1))], axis=2).reshape(gh * st, gw * st)
    up = a[:hc, :wc]

    inside = jnp.all(-(inx * (xs[None] - ipx) + iny * (ys[None] - ipy)) > 0.0, axis=0)
    return jnp.where(inside & ok_orient, jnp.maximum(up, 0.0), 0.0)


def analytic_frame_weight(H: jnp.ndarray, hf: int, wf: int, hc: int, wc: int) -> jnp.ndarray:
    """w_new on the canvas grid: the exact cv2.distanceTransform of the warped
    frame mask (reference main.py:888), computed ANALYTICALLY instead of by
    rasterize+EDT. See frame_weight_params/frame_weight_eval; this is their
    composition for single-frame use.

    The warped mask is (convex quad Q = H*frame-rect) INTERSECTED with the
    canvas array, and cv2's distance is to the nearest ZERO pixel, i.e. to
    Z = canvas minus Q = union over edges i of (outside half-plane O_i ∩ canvas).
    dist(p, O_i ∩ canvas) for p in Q is the min distance to the 5 boundary
    segments of that clipped half-plane: the chord (edge line clipped to the
    canvas, Liang-Barsky) and the four canvas sides clipped to O_i. This
    reproduces cv2's behavior on CLIPPED warps: an edge outside the canvas
    contributes no zeros, so distances keep growing past it. Distances use
    cv2's chamfer-3x4 point metric; the quad is the bilinear-support-expanded
    source rect with half-pixel raster-phase inflation (see params fn)."""
    return frame_weight_eval(frame_weight_params(H, hf, wf, hc, wc), hc, wc)


def hole_limited_distance(holes: jnp.ndarray, radius: int = 16) -> jnp.ndarray:
    """Chamfer-3x4 distance (px) from every pixel to the nearest True pixel of
    `holes`, exact up to `radius`; ~1e9 beyond. Separable banded transform:
    power-of-two min-plus row pass (exact 1D), then a +-radius column combine
    in the chamfer point metric."""
    big = jnp.float32(1e9)
    d = jnp.where(holes, 0.0, big)
    k = 1
    while k < radius:
        k *= 2
    while k >= 1:
        d = jnp.minimum(d, _shift2d(d, 0, k, big) + k)
        d = jnp.minimum(d, _shift2d(d, 0, -k, big) + k)
        k //= 2
    # column combine with STATIC shifts: a fori_loop here costs ~10 ms per
    # 16-frame window in TPU loop-iteration overhead (25 iterations x 16
    # scan steps of ~4 MB ops); chamfer_pt is monotone in its first arg, so
    # min(up, down) before the combine is exact
    out = _chamfer_pt(d, 0.0)
    for dy in range(1, radius + 1):
        pair = jnp.minimum(_shift2d(d, dy, 0, big), _shift2d(d, -dy, 0, big))
        out = jnp.minimum(out, _chamfer_pt(pair, float(dy)))
    return out


def _upsample2_aligned(a: jnp.ndarray, hc: int, wc: int) -> jnp.ndarray:
    """Grid-aligned 2x bilinear upsample (even taps copy, odd taps average) —
    the same phase-exact scheme frame_weight_eval uses; jax.image.resize's
    half-pixel centers would shift the field by 0.5 px."""
    gh, gw = a.shape
    a = jnp.stack([a, 0.5 * (a + jnp.concatenate([a[1:], a[-1:]], 0))], axis=1).reshape(gh * 2, gw)
    a = jnp.stack([a, 0.5 * (a + jnp.concatenate([a[:, 1:], a[:, -1:]], 1))], axis=2).reshape(gh * 2, gw * 2)
    return a[:hc, :wc]


def hole_limited_distance_strided(holes: jnp.ndarray, radius: int = 16) -> jnp.ndarray:
    """hole_limited_distance evaluated on a stride-2 grid and upsampled.

    The chamfer field is piecewise linear (cones around holes), so a 2x grid
    + grid-aligned bilinear upsample reproduces it to ~1 px — the same
    argument frame_weight_eval uses for the quad field — at ~1/4 the HBM
    traffic (r4 profile: the full-res transform's ~45 full-canvas shift ops
    were the dominant surviving paint cost). Holes are any-pooled into the
    coarse grid (<= 1 px dilation).

    The coarse transform runs with r_lo = radius (NOT radius/2): the full-res
    transform's min-plus row pass actually propagates real values to
    2*radius-1 px and its column combine to radius px, and the blend USES
    those beyond-'radius' values (min(w_quad, d)); an r5 regression measured
    -15 dB PSNR when the strided field plateaued at ~1.3x radius. With
    r_lo = radius the coarse coverage (2x in full-res units) strictly
    contains the full-res version's, i.e. it is closer to the cv2 oracle's
    unbounded transform. The beyond-coverage plateau (~1e9) cannot be
    interpolated across (a 15-vs-1e9 pair would blow up mid values), so the
    field is capped for the upsample and the plateau is restored wherever all
    contributing coarse taps sit on it."""
    hc, wc = holes.shape
    ph, pw = (-hc) % 2, (-wc) % 2
    h2 = jnp.pad(holes, ((0, ph), (0, pw)))
    h_lo = h2.reshape((hc + ph) // 2, 2, (wc + pw) // 2, 2).max(axis=(1, 3))
    r_lo = radius
    d_lo = hole_limited_distance(h_lo, r_lo)
    cap = jnp.float32(2.0 * r_lo)
    up = _upsample2_aligned(jnp.minimum(d_lo, cap), hc, wc) * 2.0
    plateau = _upsample2_aligned((d_lo >= cap).astype(jnp.float32), hc, wc)
    return jnp.where(plateau > 0.999, jnp.float32(1e9), up)


def frame_weight_with_holes(new_px: jnp.ndarray, w_quad: jnp.ndarray, radius: int = 16) -> jnp.ndarray:
    """Complete w_new: the analytic clipped-quad distance, limited by the
    distance to black CONTENT pixels inside the footprint. The reference's
    mask is `any(warped > 0)` (main.py:875-880), so interior black pixels are
    mask holes: they are never painted and they pull the distance transform
    down in their neighborhood. w_quad > 0 gates the footprint; holes get
    w_new = 0 (not painted — exactly the reference's np.where semantics)."""
    content = jnp.max(new_px, axis=0) > 0.0
    holes = (w_quad > 0.0) & ~content
    d_holes = hole_limited_distance_strided(holes, radius)
    return jnp.where(content, jnp.minimum(w_quad, d_holes), 0.0)


def warp_frame_cm(
    frame: jnp.ndarray, frame_weight: jnp.ndarray, H: jnp.ndarray, hc: int, wc: int
):
    """Warp a channel-major frame [3, Hf, Wf] onto the canvas grid. Returns
    (new_px [3, Hc, Wc], w_new [Hc, Wc]); two-pass MXU warp when H is in-regime,
    gather fallback otherwise (lax.cond runs one branch). The weight map comes from
    the analytic inverse map (frame_weight is accepted for API stability)."""
    hf, wf = frame.shape[1], frame.shape[2]
    ok = two_pass_regime_ok(H, hc, wc)
    warped = jax.lax.cond(
        ok,
        lambda _: warp_two_pass(frame, H, hc, wc),
        lambda _: _warp_gather_cm(frame, H, hc, wc),
        operand=None,
    )
    w_new = frame_weight_with_holes(warped, analytic_frame_weight(H, hf, wf, hc, wc))
    return warped, w_new


def coarse_footprint(w_new: jnp.ndarray, cell: int = CELL_PX) -> jnp.ndarray:
    """Downsample a full-res weight map to a coarse bool occupancy grid (any-pool)."""
    h, w = w_new.shape
    gh, gw = -(-h // cell), -(-w // cell)
    p = jnp.pad(w_new, ((0, gh * cell - h), (0, gw * cell - w)))
    return p.reshape(gh, cell, gw, cell).max(axis=(1, 3)) > 0.0


def upsample_weight(coarse_px: jnp.ndarray, hc: int, wc: int, cell: int = CELL_PX) -> jnp.ndarray:
    """Bilinear-upsample a coarse distance map back to canvas resolution."""
    gh, gw = coarse_px.shape
    up = jax.image.resize(coarse_px, (gh * cell, gw * cell), method="bilinear")
    return up[:hc, :wc]


def union_weight(canvas: jnp.ndarray, union_coarse: jnp.ndarray, hc: int, wc: int) -> jnp.ndarray:
    """w_old on the canvas grid — distanceTransform of the growing mosaic mask
    (reference main.py:889): exact coarse EDT, bilinear-upsampled, corrected for
    the half-cell inflation of the any-pooled footprint, and gated by the actual
    canvas coverage so black canvas never participates in feathering."""
    up = upsample_weight(coarse_union_distance(union_coarse), hc, wc)
    cover = jnp.max(canvas, axis=0) > 0.0
    return jnp.where(cover, jnp.maximum(up - CELL_PX / 2.0, 1.0), 0.0)


def warp_blend_fast(
    canvas: jnp.ndarray,
    canvas_weight: jnp.ndarray,
    frame: jnp.ndarray,
    frame_weight: jnp.ndarray,
    H: jnp.ndarray,
) -> BlendedCanvas:
    """Fused warp+blend (channel-major: canvas [3, Hc, Wc], frame [3, Hf, Wf]):
    standalone API keeping the running-max weight semantics (the stitcher composes
    warp_frame_cm with the union-distance weighting instead)."""
    hc, wc = canvas.shape[1], canvas.shape[2]
    new_px, w_new = warp_frame_cm(frame, frame_weight, H, hc, wc)
    return _blend_cm(canvas, canvas_weight, new_px, w_new)


def warp_blend(
    canvas: jnp.ndarray,
    canvas_weight: jnp.ndarray,
    frame: jnp.ndarray,
    frame_weight: jnp.ndarray,
    H: jnp.ndarray,
) -> BlendedCanvas:
    """Warp `frame` [H, W, 3] by homography H (frame -> canvas coords) and feather-blend
    it into `canvas` [Hc, Wc, 3]. All float32. Returns the updated canvas + weight map.

    The gather is over the full canvas; XLA fuses the coordinate math, bilinear gather,
    and blend selects into one kernel. (Footprint-tiled Pallas variant is the planned
    optimization for very large canvases.)
    """
    hc, wc = canvas.shape[0], canvas.shape[1]
    hf, wf = frame.shape[0], frame.shape[1]

    hinv = jnp.linalg.inv(H)
    ys = jnp.arange(hc, dtype=jnp.float32)[:, None]
    xs = jnp.arange(wc, dtype=jnp.float32)[None, :]
    den = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / den
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / den

    inb = (sx >= 0.0) & (sx <= wf - 1.0) & (sy >= 0.0) & (sy <= hf - 1.0) & (den > 0.0)

    new_px = bilinear_sample(frame, sx, sy)  # [Hc, Wc, 3]
    w_new = jnp.where(inb, bilinear_sample(frame_weight, sx, sy), 0.0)  # [Hc, Wc]

    has_new = w_new > 0.0
    has_old = canvas_weight > 0.0
    alpha = w_new / (w_new + canvas_weight + 1e-6)

    blended = alpha[..., None] * new_px + (1.0 - alpha[..., None]) * canvas
    out = jnp.where(
        (has_new & has_old)[..., None],
        blended,
        jnp.where(has_new[..., None], new_px, canvas),
    )
    out_w = jnp.maximum(canvas_weight, w_new)
    return BlendedCanvas(canvas=out, weight=out_w)


def warp_perspective(
    frame: jnp.ndarray, H: jnp.ndarray, out_h: int, out_w: int
) -> jnp.ndarray:
    """Plain cv2.warpPerspective equivalent (INTER_LINEAR, zero border) for tests and
    standalone use."""
    hf, wf = frame.shape[0], frame.shape[1]
    hinv = jnp.linalg.inv(H)
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    den = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / den
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / den
    inb = (sx >= 0.0) & (sx <= wf - 1.0) & (sy >= 0.0) & (sy <= hf - 1.0)
    out = bilinear_sample(frame, sx, sy)
    if frame.ndim == 3:
        inb = inb[..., None]
    return jnp.where(inb, out, 0.0)
