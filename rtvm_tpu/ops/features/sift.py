"""SIFT-style DoG features as fixed-shape, gather-free XLA ops.

TPU-native replacement for cv2.SIFT_create(700) (reference main.py:33): Gaussian
scale-space pyramid, DoG extrema with contrast + edge (Hessian-ratio) tests and 2D
subpixel refinement, dominant gradient orientation, and 4x4x8 = 128-d
gradient-histogram descriptors.

Per-element dynamic gathers are the slow path on TPU (~8 ms per 1M points), so the
descriptor stage avoids them:
- one fixed-size patch per keypoint is cut from each candidate DoG level with vmap'd
  dynamic_slice (sliced-DMA fast path) and the keypoint's level is applied as a
  one-hot select over the (few) levels;
- gradient magnitude/orientation are elementwise within patches;
- the dominant orientation is a 36-bin mag-weighted histogram via one einsum;
- descriptors quantize the keypoint angle into 16 bins: per-bin rotated spatial-bin
  weight tables are STATIC [bins, P^2, 16] constants, selected per keypoint by a
  one-hot einsum; orientation binning stays continuous (the angle is subtracted
  before soft 8-bin binning). All heavy contractions land on the MXU.

Self-consistency note: descriptors only ever match other descriptors from this code;
geometric accuracy (subpixel keypoints, rotation invariance) is the target, not
bit-parity with OpenCV.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.features.fast import topk2d_blocked
from rtvm_tpu.ops.filters import (
    gaussian_blur,
    gaussian_kernel1d,
    maxpool3x3,
    minmaxpool3x3,
)

PATCH = 32  # descriptor patch side (octave pixels)
# Row-interleave factor for patch extraction. Measured on v5e (per-frame, 700
# patches): I=2 1.01 ms, I=8 1.55 ms despite 3.4x fewer DMA rows — wider
# (8P-lane) slices bill worse than narrow ones, so 2 is the sweet spot.
INTERLEAVE = int(__import__("os").environ.get("RTVM_SIFT_INTERLEAVE", "2"))
N_ROT_BINS = 16  # quantized keypoint-angle bins for the spatial weight tables
N_SPATIAL = 4  # 4x4 spatial bins
N_ORI = 8  # orientation bins -> 128-d


def _octave_quotas(k: int, octaves: int, decay: float = 4.0) -> list[int]:
    """Geometric split of the keypoint budget across octaves (finest gets most).
    decay follows cv2.SIFT's measured fine-scale-heavy distribution on aerial
    footage (FeatureConfig.sift_octave_decay)."""
    raw = np.array([float(decay) ** (-o) for o in range(octaves)])
    q = np.floor(k * raw / raw.sum()).astype(int)
    q[0] += k - q.sum()
    return [int(x) for x in q]


@functools.lru_cache(maxsize=32)
def _band_matrix_y(deltas_key: tuple, h: int) -> np.ndarray:
    """Per-level separable Gaussian y-blurs as DENSE banded matrices.

    The 1-input-channel multi-tap convs the pyramid needs map terribly onto
    the MXU (measured ~13 ms per 16-frame window for octave 0); expressing
    each level's y blur as `By_l @ img` turns it into batched [L] dense
    matmuls the MXU eats (~20x more raw FLOPs, ~15x less time). The x-pass
    uses the block-banded weights instead (_blocked_band_weights) — building
    a dense [L, W, W] Bx here would be dead weight. Edge-replicate padding is
    folded into the border rows by accumulating clipped taps.
    Returns By [L, H, H] float32.
    """
    deltas = np.asarray(deltas_key, np.float64)
    L = len(deltas)
    rad = max(1, int(math.ceil(3.0 * float(deltas.max()))))
    By = np.zeros((L, h, h), np.float32)
    for i, d in enumerate(deltas):
        if d < 1e-6:
            taps = np.zeros(2 * rad + 1, np.float32)
            taps[rad] = 1.0
        else:
            taps = gaussian_kernel1d(float(d), rad)
        for t in range(2 * rad + 1):
            off = t - rad
            # y: out row i2 <- in row clip(i2+off); By[l, out, in]
            r = np.arange(h)
            By[i, r, np.clip(r + off, 0, h - 1)] += taps[t]
    return By


def _tile_for(n: int) -> tuple[int, int]:
    """(tile, n_tiles): 128 for MXU-sized axes, one padded tile for small ones."""
    t = 128 if n >= 192 else max(8, ((n + 7) // 8) * 8)
    return t, (n + t - 1) // t


@functools.lru_cache(maxsize=32)
def _blocked_band_weights(deltas_key: tuple, h: int, w: int):
    """Per-level separable blurs as BLOCK-banded matmul weights.

    A dense [W, W] band matrix would waste W/(2r+1) ~ 4-20x
    FLOPs on zeros outside the band. Tiling output columns into 128-wide
    blocks shrinks each matmul to [tile+2r, tile] — ~4x fewer FLOPs at 360p
    with MXU-friendly shapes. Edge-replicate padding folds into the border
    tiles' weights (input is zero-padded by `rad`, clipped taps accumulate
    onto valid columns). Returns (Wx [L,Tw,tw+2r,tw], Wy [L,Th,th,th+2r],
    rad, tw, Tw, th, Th)."""
    deltas = np.asarray(deltas_key, np.float64)
    L = len(deltas)
    rad = max(1, int(math.ceil(3.0 * float(deltas.max()))))
    tw, Tw = _tile_for(w)
    th, Th = _tile_for(h)
    Wx = np.zeros((L, Tw, tw + 2 * rad, tw), np.float32)
    Wy = np.zeros((L, Th, th, th + 2 * rad), np.float32)
    for li, d in enumerate(deltas):
        taps = gaussian_kernel1d(float(d), rad)
        for t in range(Tw):
            j = np.arange(tw)
            J = t * tw + j
            ok = J < w
            for k in range(2 * rad + 1):
                q = np.clip(J + (k - rad), 0, w - 1) + rad - t * tw
                np.add.at(Wx[li, t], (q[ok], j[ok]), taps[k])
        for t in range(Th):
            i = np.arange(th)
            I = t * th + i
            ok = I < h
            for k in range(2 * rad + 1):
                q = np.clip(I + (k - rad), 0, h - 1) + rad - t * th
                np.add.at(Wy[li, t], (i[ok], q[ok]), taps[k])
    return Wx, Wy, rad, tw, Tw, th, Th


def _octave_levels(base: jnp.ndarray, deltas: np.ndarray) -> jnp.ndarray:
    """All Gaussian levels of one octave as TWO batched block-banded matmuls.

    base [H, W]; deltas[l] = sqrt(sigma_l^2 - sigma_base^2) (0 for level 0).
    Every level is blurred DIRECTLY from the base (Gaussian semigroup) so the
    L levels batch into one einsum; zero-delta levels are the base itself and
    skip the matmuls entirely. Precision.HIGH (bf16x3) keeps ~1e-6 relative
    error — two decades below the smallest DoG contrasts (~1e-3) the detector
    thresholds on. Returns [L, H, W]."""
    h, w = base.shape
    nz = [i for i, d in enumerate(deltas) if float(d) > 1e-6]
    if not nz:
        return jnp.broadcast_to(base, (len(deltas), h, w))
    dk = tuple(round(float(deltas[i]), 6) for i in nz)
    Wx, Wy, rad, tw, Tw, th, Th = _blocked_band_weights(dk, h, w)
    hi = jax.lax.Precision.HIGH
    Wxj = jnp.asarray(Wx)
    del Wy  # y-pass uses the dense matrices (layout note below)
    # Per-tile einsums + concat along exact tile boundaries (128 cols / 128
    # rows) lower to contiguous copies; a single einsum with a tile batch dim
    # needs a moveaxis relayout afterwards that TPU executes as a slow
    # lane-crossing transpose.
    P = jnp.pad(base, ((0, 0), (rad, rad + Tw * tw - w)))
    X = jnp.concatenate(
        [
            jnp.einsum(
                "hc,lcj->lhj",
                jax.lax.slice_in_dim(P, t * tw, t * tw + tw + 2 * rad, axis=1),
                Wxj[:, t],
                precision=hi,
            )
            for t in range(Tw)
        ],
        axis=-1,
    )[:, :, :w]  # [L, H, W]
    # y-pass stays DENSE [H, H]: a row-tiled y output (concat along the
    # sublane-major axis) carries a compiler layout that demotes the
    # downstream per-keypoint patch dynamic_slices from sliced-DMA to a
    # gather-style copy (measured 0.11 -> 1.1 ms/frame on the descriptor
    # path); the dense einsum's plain [L, H, W] output keeps them fast, and
    # the x-pass already removed ~60% of the pyramid FLOPs.
    By = _band_matrix_y(dk, h)
    Y = jnp.einsum("lhH,lHw->lhw", jnp.asarray(By), X, precision=hi)
    if len(nz) == len(deltas):
        return Y
    out, j = [], 0
    for d in deltas:
        if float(d) > 1e-6:
            out.append(Y[j])
            j += 1
        else:
            out.append(base)
    return jnp.stack(out)


def _detect_octave(dogs, quota, contrast_threshold, edge_r, border, overfetch=2):
    """Find up to `quota` extrema in one octave's DoG stack [L-1, H, W].
    Returns (xy [Q,2] octave coords, level [Q] int32 (1..s), score, valid).

    The Hessian edge test runs POINT-WISE on `overfetch * quota` top-scored
    extremum candidates (9 neighborhood gathers each) instead of as full-map
    roll chains — the 10 [S, H, W] rolls the edge test needs were ~30% of the
    detect stage. Edge-rejected candidates burn an overfetch slot; with 2x
    overfetch and the measured ~5-10% edge-rejection rate the final quota
    still fills (equal-budget inlier-parity gates vs cv2 hold)."""
    nl, h, w = dogs.shape
    mid = dogs[1:-1]  # [S, H, W] candidate layers

    # minmaxpool3x3 pools spatially per level sharing one set of shifted
    # views, so the mid levels' own-layer pools are exactly pmax[1:-1] /
    # pmin[1:-1] — reuse instead of 2 more pool passes
    pmax, pmin = minmaxpool3x3(dogs)
    is_max = (mid >= pmax[:-2]) & (mid >= pmax[2:]) & (mid >= pmax[1:-1] - 1e-12) & (mid > 0)
    is_min = (mid <= pmin[:-2]) & (mid <= pmin[2:]) & (mid <= pmin[1:-1] + 1e-12) & (mid < 0)
    score = jnp.abs(mid)
    extremum = (is_max | is_min) & (score > contrast_threshold)

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)[None]
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)[None]
    inside = (yy >= border) & (yy < h - border) & (xx >= border) & (xx < w - border)

    final = jnp.where(extremum & inside, score, 0.0)
    # two-stage blocked top-k (shared with FAST): ~8x fewer top_k candidates
    k2 = overfetch * quota
    top, row, kx, valid = topk2d_blocked(final.reshape(-1, w), k2)
    lvl = row // h
    ky = row % h

    def nb(dy, dx):
        return mid[lvl, jnp.clip(ky + dy, 0, h - 1), jnp.clip(kx + dx, 0, w - 1)]

    c0 = nb(0, 0)
    xp, xm, yp, ym = nb(0, 1), nb(0, -1), nb(1, 0), nb(-1, 0)
    hxx = xp + xm - 2 * c0
    hyy = yp + ym - 2 * c0
    hxy = 0.25 * (nb(1, 1) + nb(-1, -1) - nb(1, -1) - nb(-1, 1))
    tr = hxx + hyy
    det = hxx * hyy - hxy * hxy
    edge_ok = (det > 0) & (tr * tr * edge_r < (edge_r + 1.0) ** 2 * det)
    valid = valid & edge_ok

    g_x = 0.5 * (xp - xm)
    g_y = 0.5 * (yp - ym)
    deth = det
    deth = jnp.where(jnp.abs(deth) < 1e-12, 1e-12, deth)
    ox = jnp.clip(-(hyy * g_x - hxy * g_y) / deth, -0.5, 0.5)
    oy = jnp.clip(-(hxx * g_y - hxy * g_x) / deth, -0.5, 0.5)

    # compact the edge-survivors into the fixed quota (rank by masked score)
    sc = jnp.where(valid, top, 0.0)
    top_q, sel = jax.lax.top_k(sc, quota)
    xy = jnp.stack(
        [kx[sel].astype(jnp.float32) + ox[sel], ky[sel].astype(jnp.float32) + oy[sel]],
        axis=-1,
    )
    valid_q = top_q > 0.0
    return xy, (lvl[sel] + 1).astype(jnp.int32), top_q, valid_q


@functools.lru_cache(maxsize=8)
def _static_tables(sigma_desc: float):
    """Static weight tables:
    - ori window [P, P] Gaussian for the 36-bin orientation histogram;
    - per-rotation-bin spatial weights [N_ROT_BINS, P*P, 16] with the descriptor's
      Gaussian window folded in.
    """
    ctr = (PATCH - 1) / 2.0
    d = np.arange(PATCH, dtype=np.float32) - ctr
    yy, xx = np.meshgrid(d, d, indexing="ij")
    r2 = xx**2 + yy**2
    ori_win = np.exp(-r2 / (2.0 * (0.4 * PATCH / 2) ** 2)).astype(np.float32)

    R = sigma_desc  # descriptor support radius in patch pixels
    spatial = np.zeros((N_ROT_BINS, PATCH * PATCH, N_SPATIAL * N_SPATIAL), np.float32)
    for b in range(N_ROT_BINS):
        th = 2.0 * np.pi * b / N_ROT_BINS
        c, s = np.cos(th), np.sin(th)
        # rotate pixel offsets into the keypoint frame
        u = (c * xx + s * yy) / R  # [-..,..] normalized
        v = (-s * xx + c * yy) / R
        bx = (u + 1.0) * 0.5 * N_SPATIAL - 0.5
        by = (v + 1.0) * 0.5 * N_SPATIAL - 0.5
        win = np.exp(-(u**2 + v**2) / (2.0 * 0.5**2))
        for iy in range(N_SPATIAL):
            wy = np.maximum(0.0, 1.0 - np.abs(by - iy))
            for ix in range(N_SPATIAL):
                wx = np.maximum(0.0, 1.0 - np.abs(bx - ix))
                spatial[b, :, iy * N_SPATIAL + ix] = (wy * wx * win).reshape(-1)
    return ori_win, spatial


def _extract_level_patches(gauss_mid: jnp.ndarray, xy: jnp.ndarray, lvl: jnp.ndarray):
    """Cut [Q, P, P] patches at integer coords from the keypoint's own level.
    gauss_mid: [S, H, W] (levels 1..s of the Gaussian stack); lvl in 1..s.

    DMA-row economy (patch slices are billed per row): the levels are stacked
    vertically so the keypoint's LEVEL becomes part of the dynamic row offset
    (one [P, P] slice instead of an [S, P, P] slice — S x fewer rows, no
    one-hot level select), and groups of I=8 rows are column-interleaved so
    the slice needs P/8+1 rows of 8P lanes with an exact phase-select
    reconstruction. Net: 96 -> 5 DMA rows per keypoint (the 2-row interleave
    this replaces still paid 17)."""
    s, h, w = gauss_mid.shape
    half = PATCH // 2
    I = INTERLEAVE  # row-interleave factor
    nrows = PATCH // I + 1
    wp = ((w + 127) // 128) * 128
    # Materialize the level stack with a dense layout BEFORE the interleave
    # transpose: since the block-banded pyramid, gauss_mid arrives as a lazy
    # stack of tile-concat slices, and fusing that producer into the transpose
    # (or into the ~700 vmapped dynamic_slices) drops the path from sliced-DMA
    # to a gather-style copy (measured 0.11 -> 1.1+ ms/frame).
    gauss_mid = jax.lax.optimization_barrier(gauss_mid)
    big = jnp.pad(gauss_mid, ((0, 0), (0, 0), (0, wp - w))).reshape(s * h, wp)
    # pad rows to a multiple of I plus slack so ybase + nrows stays in range
    big = jnp.pad(big, ((0, (-big.shape[0]) % I + I), (0, 0)))
    rows_i = big.shape[0] // I
    inter = big.reshape(rows_i, I, wp).transpose(0, 2, 1).reshape(rows_i, I * wp)

    ys = jnp.clip(xy[:, 1].astype(jnp.int32) - half, 0, h - PATCH - 2) + (lvl - 1) * h
    xs = jnp.clip(xy[:, 0].astype(jnp.int32) - half, 0, w - PATCH)
    par = ys % I
    ybase = ys // I

    def one(y0, x0):
        return jax.lax.dynamic_slice(inter, (y0, I * x0), (nrows, I * PATCH))

    sl = jax.vmap(one)(ybase, xs)  # [Q, P/8+1, 8P]; lane j = (col, phase)
    # [Q, nrows, P, I] -> [Q, nrows, I, P] -> [Q, nrows*I, P]: flat row r*I+i
    # is original row ybase*I + r*I + i, so rows par..par+P-1 are the patch
    blk = sl.reshape(-1, nrows, PATCH, I).transpose(0, 1, 3, 2).reshape(
        -1, nrows * I, PATCH
    )
    # phase select via I static slices + where chain (vectorized VPU selects;
    # a per-keypoint dynamic_slice here lowers to a slow gather-style copy)
    out = blk[:, :PATCH]
    for p in range(1, I):
        out = jnp.where((par == p)[:, None, None], blk[:, p : p + PATCH], out)
    return out


def _extract_level_patches_pallas(gauss_mid: jnp.ndarray, xy: jnp.ndarray, lvl: jnp.ndarray):
    """TPU tier of _extract_level_patches: identical integer-aligned patches
    via ONE Pallas kernel over a VMEM-resident level stack (the XLA vmap'd
    dynamic_slice path pays ~1.4 us of dispatch overhead PER keypoint — ~1
    ms/frame at K=700 — insensitive to slice bytes or row count; the kernel
    loop is ~5x cheaper). Same ys clip as the XLA path so both tiers cut
    byte-identical patches."""
    s, h, w = gauss_mid.shape
    half = PATCH // 2
    gauss_mid = jax.lax.optimization_barrier(gauss_mid)
    ys = jnp.clip(xy[:, 1].astype(jnp.int32) - half, 0, h - PATCH - 2) + (lvl - 1) * h
    xs = jnp.clip(xy[:, 0].astype(jnp.int32) - half, 0, w - PATCH)
    from rtvm_tpu.ops.pallas_patches import extract_patches_pallas

    return extract_patches_pallas(gauss_mid.reshape(s * h, w), ys, xs, PATCH)


def _extract_patches_tiered(gauss_mid: jnp.ndarray, xy: jnp.ndarray, lvl: jnp.ndarray):
    """Backend tier: Pallas kernel on real TPU, XLA interleave path elsewhere
    (interpret-mode Pallas is far too slow for the CPU test backend)."""
    if jax.default_backend() == "tpu":
        return _extract_level_patches_pallas(gauss_mid, xy, lvl)
    return _extract_level_patches(gauss_mid, xy, lvl)


def _orientation_and_descriptors(patches: jnp.ndarray, valid: jnp.ndarray, sigma_desc: float):
    """patches [Q, P, P] (any float dtype; bf16 from the sliced-DMA path) ->
    (theta [Q], desc [Q, 128])."""
    patches = patches.astype(jnp.float32)
    q = patches.shape[0]
    gx = 0.5 * (jnp.roll(patches, -1, 2) - jnp.roll(patches, 1, 2))
    gy = 0.5 * (jnp.roll(patches, -1, 1) - jnp.roll(patches, 1, 1))
    mag = jnp.sqrt(gx * gx + gy * gy)
    ori = jnp.arctan2(gy, gx)  # [-pi, pi]

    ori_win, spatial = _static_tables(sigma_desc)
    # histogram/descriptor contractions ride the MXU in bf16 (~0.4% relative
    # weight error into L2-normalized 128-d bins — far below matching noise)
    bf = jnp.bfloat16
    wmag = (mag * jnp.asarray(ori_win)[None]).astype(bf)

    # --- dominant orientation: 36-bin histogram via soft binning einsum ---
    bins36 = (ori % (2 * jnp.pi)) / (2 * jnp.pi) * 36.0
    b0 = jnp.floor(bins36).astype(jnp.int32) % 36
    frac = bins36 - jnp.floor(bins36)
    oh0 = jax.nn.one_hot(b0, 36, dtype=bf) * (1 - frac)[..., None].astype(bf)
    oh1 = jax.nn.one_hot((b0 + 1) % 36, 36, dtype=bf) * frac[..., None].astype(bf)
    hist = jnp.einsum("qpr,qprb->qb", wmag, oh0 + oh1, preferred_element_type=jnp.float32)
    hist = hist + 0.5 * (jnp.roll(hist, 1, 1) + jnp.roll(hist, -1, 1))
    peak = jnp.argmax(hist, axis=1)
    # parabolic peak interpolation (cv2 does the same): +-5 deg argmax
    # quantization decorrelates matched descriptors across frames
    hl = jnp.take_along_axis(hist, ((peak - 1) % 36)[:, None], 1)[:, 0]
    hr = jnp.take_along_axis(hist, ((peak + 1) % 36)[:, None], 1)[:, 0]
    hp = jnp.take_along_axis(hist, peak[:, None], 1)[:, 0]
    denom = hl - 2.0 * hp + hr
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (hl - hr) / denom, 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    theta = (peak.astype(jnp.float32) + 0.5 + off) * (2 * jnp.pi / 36.0)

    # --- descriptor: quantized-rotation spatial weights x continuous ori bins ---
    # two-hot linear blend of the two nearest rotation tables: same contraction
    # FLOPs as a one-hot select, but the spatial weights vary continuously with
    # theta instead of snapping at 22.5-degree bin edges (a snap straddled by a
    # matched pair perturbs the whole 128-d descriptor)
    rb = (theta / (2 * jnp.pi) * N_ROT_BINS) % N_ROT_BINS
    b0 = jnp.floor(rb).astype(jnp.int32) % N_ROT_BINS
    rfrac = (rb - jnp.floor(rb)).astype(bf)
    rot_oh = (
        jax.nn.one_hot(b0, N_ROT_BINS, dtype=bf) * (1 - rfrac)[:, None]
        + jax.nn.one_hot((b0 + 1) % N_ROT_BINS, N_ROT_BINS, dtype=bf) * rfrac[:, None]
    )  # [Q, B]
    wsel = jnp.einsum("qb,bps->qps", rot_oh, jnp.asarray(spatial).astype(bf))  # [Q, P*P, 16]

    rel = (ori - theta[:, None, None]) % (2 * jnp.pi) / (2 * jnp.pi) * N_ORI
    o0 = jnp.floor(rel).astype(jnp.int32) % N_ORI
    of = rel - jnp.floor(rel)
    ooh = (
        jax.nn.one_hot(o0, N_ORI, dtype=bf) * (1 - of)[..., None].astype(bf)
        + jax.nn.one_hot((o0 + 1) % N_ORI, N_ORI, dtype=bf) * of[..., None].astype(bf)
    )  # [Q, P, P, 8]
    contrib = (mag.astype(bf)[..., None] * ooh).reshape(q, PATCH * PATCH, N_ORI)
    desc = jnp.einsum(
        "qps,qpo->qso", wsel, contrib, preferred_element_type=jnp.float32
    ).reshape(q, N_SPATIAL * N_SPATIAL * N_ORI)

    norm = jnp.sqrt(jnp.sum(desc**2, axis=-1, keepdims=True)) + 1e-7
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.sqrt(jnp.sum(desc**2, axis=-1, keepdims=True)) + 1e-7
    desc = desc / norm
    return theta, desc * valid[:, None]


def detect_and_describe(gray: jnp.ndarray, cfg) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """gray [H, W] float (0..255) -> (xy [K, 2] full-res coords, desc [K, 128] float32,
    valid [K]). cfg is a FeatureConfig."""
    k = cfg.max_keypoints
    s = cfg.sift_scales
    octaves = cfg.sift_octaves
    sigma0 = cfg.sift_sigma
    quotas = _octave_quotas(k, octaves, getattr(cfg, "sift_octave_decay", 4.0))

    img = gray / 255.0
    kfac = 2.0 ** (1.0 / s)
    sigmas = np.array([sigma0 * kfac**l for l in range(s + 3)], dtype=np.float32)
    # direct-from-base sigma deltas for the fused per-octave blur (semigroup)
    deltas = np.sqrt(np.maximum(sigmas**2 - sigmas[0] ** 2, 0.0))

    xs_all, patch_all, valid_all = [], [], []
    base = gaussian_blur(img, float(np.sqrt(max(sigma0**2 - 0.25, 0.01))))
    for o in range(octaves):
        gauss = _octave_levels(base, deltas)  # [s+3, H, W]
        dogs = gauss[1:] - gauss[:-1]  # [s+2, H, W]

        xy, lvl, _, valid = _detect_octave(
            dogs, quotas[o], cfg.sift_contrast_threshold, 10.0, cfg.border_margin
        )
        patches = _extract_patches_tiered(gauss[1 : s + 1], xy, lvl)

        xs_all.append(xy * float(2**o))
        patch_all.append(patches)
        valid_all.append(valid)

        if o + 1 < octaves:
            base = gauss[s][::2, ::2]

    # one orientation+descriptor pass over ALL octaves' patches: sigma_desc is
    # octave-independent (octave scale lives in the downsampling), so a single
    # [K, P, P] batch replaces 4 small einsum sets — far better MXU tiling for
    # the coarse octaves' tiny quotas
    xy = jnp.concatenate(xs_all, axis=0)
    patches = jnp.concatenate(patch_all, axis=0)
    valid = jnp.concatenate(valid_all, axis=0)
    _theta, desc = _orientation_and_descriptors(
        patches, valid, sigma_desc=6.0 * float(sigmas[s // 2 + 1])
    )
    xy = jnp.where(valid[:, None], xy, 0.0)
    return xy, desc, valid
