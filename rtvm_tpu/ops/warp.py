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


def coarse_union_distance(union: jnp.ndarray, cell_px: float = 8.0) -> jnp.ndarray:
    """Distance (in pixels) from each cell of a coarse union-occupancy grid to the
    nearest non-union cell — the TPU stand-in for cv2.distanceTransform of the
    growing mosaic mask (reference main.py:888-890).

    Octagonal min-plus relaxation with power-of-two shifts in 8 directions: exact for
    L1/Linf, <=8% over Euclidean — well within feathering tolerance. All elementwise,
    ~60 shifted mins on the [Hc/8, Wc/8] grid.
    """
    gh, gw = union.shape
    big = jnp.float32(4.0 * max(gh, gw))
    d = jnp.where(union, big, 0.0)
    kmax = 1
    while kmax * 2 < max(gh, gw):
        kmax *= 2
    k = kmax
    while k >= 1:
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1)):
            step = k * (1.41421356 if (dy and dx) else 1.0)
            d = jnp.minimum(d, _shift2d(d, dy * k, dx * k, 0.0) + step)
        k //= 2
    return d * cell_px


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


def _resample_rows(rows: jnp.ndarray, pos: jnp.ndarray, wout: int, wpad: int, n_blocks: int) -> jnp.ndarray:
    """Resample each row of channel-major `rows` [C, R, Win] at float positions
    pos [R, wout] (monotonically increasing along axis 1). Linear interpolation;
    positions outside [0, Win-1] produce zeros. Returns [C, R, wout].

    Decomposition per row i: pos[i, j] = n_i + f_i + s[i, j] with s[i, 0] = 0,
    n_i integer, f_i in [0, 1). The n_i shift is a per-row dynamic_slice (sliced-DMA
    fast path — requires the padded source width to be 128-aligned, hence the padding
    arithmetic), the f_i shift a 2-tap lerp, and s (approximated by its row-block
    center) becomes a banded matrix matmul shared within each block.
    """
    c, r, win = rows.shape
    assert r % n_blocks == 0, (r, n_blocks)
    rb = r // n_blocks

    # The per-row anchor must be EXACT (n_i = floor(pos[i,0])) so that the residual
    # positions s_rel[i, 0] are all in [0, 1) and the block-center approximation only
    # absorbs the (tiny) slope variation across the block — never the per-row shear.
    # `wpad` must cover the full residual range slope_max*wout (a row anchored left of
    # the content still reaches content at large s_rel). pad_left covers the
    # most-negative anchor with visible content; rows below that contribute nothing
    # and are dropped via row_ok.
    ell = wpad + 128  # slice length, 128-aligned
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

    f = jnp.clip((pos[:, 0] - n)[:, None, None], 0.0, 1.0)  # [R, 1, 1]
    sh = sh[:, :, :wpad] * (1.0 - f) + sh[:, :, 1 : wpad + 1] * f  # [R, C, wpad]
    sh = sh * row_ok[:, None, None]

    # Residual positions relative to each row's own anchor, approximated per block.
    s_rel = pos - (n + jnp.clip(pos[:, 0] - n, 0.0, 1.0))[:, None]  # [R, wout]
    d = s_rel.reshape(n_blocks, rb, wout)[:, rb // 2, :]  # [n_blocks, wout]
    d = jnp.clip(d, -4.0, wpad + 4.0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n_blocks, wpad, wout), 1)
    m = jnp.maximum(0.0, 1.0 - jnp.abs(xs - d[:, None, :]))  # banded interp weights

    blocks = sh.reshape(n_blocks, rb, c, wpad)
    out = jnp.einsum(
        "brcx,bxj->brcj",
        blocks.astype(jnp.bfloat16),
        m.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return jnp.moveaxis(out.reshape(r, c, wout), 1, 0)  # [C, R, wout]


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
                  n_blocks: int = 8) -> jnp.ndarray:
    """Warp a channel-major [C, Hf, Wf] stack by homography H (frame -> output
    coords) onto a [C, out_h, out_w] grid using the two-pass MXU formulation.
    Valid only within the regime checked by `two_pass_regime_ok`; callers select
    the gather fallback otherwise."""
    c, hf, wf = stack.shape
    G = jnp.linalg.inv(H)

    # Pass 1: horizontal — frame rows to canvas columns.
    wpad1 = _round_up(int(1.45 * out_w) + 16, 128)
    pos1 = _pass1_positions(H, hf, out_w)  # [Hf, Wc]
    rows1 = _pad_rows_cm(stack, n_blocks)
    pos1p, _ = _pad_rows_to(pos1, n_blocks)
    t = _resample_rows(rows1, pos1p, out_w, wpad1, n_blocks)[:, :hf]  # [C, Hf, Wc]

    # Pass 2: vertical — canvas columns resampled down the frame rows.
    tt = jnp.swapaxes(t, 1, 2)  # [C, Wc, Hf]
    wpad2 = _round_up(int(1.45 * out_h) + 16, 128)
    pos2 = _pass2_positions(G, out_w, out_h)  # [Wc, Hc]
    rows2 = _pad_rows_cm(tt, n_blocks)
    pos2p, _ = _pad_rows_to(pos2, n_blocks)
    out_t = _resample_rows(rows2, pos2p, out_h, wpad2, n_blocks)[:, :out_w]  # [C, Wc, Hc]
    return jnp.swapaxes(out_t, 1, 2)  # [C, Hc, Wc]


def two_pass_regime_ok(H: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """True when the two-pass decomposition is accurate and within static padding
    bounds: small perspective, positive bounded pass slopes (|rotation| < ~40deg,
    scale within ~[0.72, 1.4])."""
    G = jnp.linalg.inv(H)
    persp_ok = (
        (jnp.abs(H[2, 0]) < 2e-4)
        & (jnp.abs(H[2, 1]) < 2e-4)
        & (jnp.abs(G[2, 0]) < 2e-4)
        & (jnp.abs(G[2, 1]) < 2e-4)
    )
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


def _blend_cm(canvas, canvas_weight, new_px, w_new) -> BlendedCanvas:
    """Feathered composite (channel-major [3, Hc, Wc] canvas) of a warped frame
    (new_px [3, Hc, Wc], weight w_new [Hc, Wc], 0 = no content) — elementwise only."""
    has_new = w_new > 0.0
    has_old = canvas_weight > 0.0
    alpha = w_new / (w_new + canvas_weight + 1e-6)
    blended = alpha[None] * new_px + (1.0 - alpha[None]) * canvas
    out = jnp.where(
        (has_new & has_old)[None],
        blended,
        jnp.where(has_new[None], new_px, canvas),
    )
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


def analytic_frame_weight(H: jnp.ndarray, hf: int, wf: int, hc: int, wc: int) -> jnp.ndarray:
    """w_new on the canvas grid, computed analytically: the distance from the
    inverse-mapped source point to the frame border (the exact distanceTransform of
    the warped frame mask in frame units) — elementwise, no 4th warp channel."""
    hinv = jnp.linalg.inv(H)
    ys = jnp.arange(hc, dtype=jnp.float32)[:, None]
    xs = jnp.arange(wc, dtype=jnp.float32)[None, :]
    den = hinv[2, 0] * xs + hinv[2, 1] * ys + hinv[2, 2]
    den = jnp.where(jnp.abs(den) < 1e-9, 1e-9, den)
    sx = (hinv[0, 0] * xs + hinv[0, 1] * ys + hinv[0, 2]) / den
    sy = (hinv[1, 0] * xs + hinv[1, 1] * ys + hinv[1, 2]) / den
    d = jnp.minimum(jnp.minimum(sx + 1.0, wf - sx), jnp.minimum(sy + 1.0, hf - sy))
    return jnp.where((d > 0.0) & (den > 0.0), d, 0.0)


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
    w_new = analytic_frame_weight(H, hf, wf, hc, wc)
    return warped, w_new


def coarse_footprint(w_new: jnp.ndarray, cell: int = 8) -> jnp.ndarray:
    """Downsample a full-res weight map to a coarse bool occupancy grid (any-pool)."""
    h, w = w_new.shape
    gh, gw = -(-h // cell), -(-w // cell)
    p = jnp.pad(w_new, ((0, gh * cell - h), (0, gw * cell - w)))
    return p.reshape(gh, cell, gw, cell).max(axis=(1, 3)) > 0.0


def upsample_weight(coarse_px: jnp.ndarray, hc: int, wc: int, cell: int = 8) -> jnp.ndarray:
    """Bilinear-upsample a coarse distance map back to canvas resolution."""
    gh, gw = coarse_px.shape
    up = jax.image.resize(coarse_px, (gh * cell, gw * cell), method="bilinear")
    return up[:hc, :wc]


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
