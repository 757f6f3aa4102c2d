"""Warp and blend tests: two-pass MXU warp vs gather oracle vs cv2.warpPerspective.
Target from BASELINE.md: mosaic PSNR >= 40 dB vs the OpenCV reference warp."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtvm_tpu.ops import warp as W
from rtvm_tpu.utils.image import psnr

HC, WC = 256, 384
HF, WF = 128, 256


def _stack_cm(img):
    fw = W.edge_distance_map(img.shape[0], img.shape[1], 16.0)
    return jnp.asarray(
        np.concatenate([img.astype(np.float32).transpose(2, 0, 1), fw[None]], axis=0)
    )


def _psnr_masked(a, b, mask):
    d = (a - b)[:, mask]
    mse = float((d**2).mean()) if d.size else 0.0
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


HS = {
    "offset": np.array([[1, 0, 60], [0, 1, 100], [0, 0, 1]], np.float32),
    "subpix": np.array([[1, 0, 60.4], [0, 1, 99.7], [0, 0, 1]], np.float32),
    "rot10_scale1.1": cv2.getRotationMatrix2D((0, 0), 10, 1.1),
    "rot-25": cv2.getRotationMatrix2D((50, 50), -25, 0.95),
    "shear": np.array([[1.05, 0.08, 30], [0.02, 0.92, 80], [0, 0, 1]], np.float32),
}


def _to3x3(m):
    if m.shape == (2, 3):
        m = np.vstack([m, [0, 0, 1]])
    m = m.astype(np.float32)
    m[0, 2] += 60
    m[1, 2] += 90
    return m


@pytest.mark.parametrize("name", list(HS))
def test_two_pass_matches_gather_warp(textured_image, name):
    img = textured_image[:HF, :WF]
    stack = _stack_cm(img)
    H = jnp.asarray(_to3x3(np.asarray(HS[name])))
    assert bool(W.two_pass_regime_ok(H, HC, WC)), name
    a = np.asarray(W.warp_two_pass(stack, H, HC, WC))
    b = np.asarray(W._warp_gather_cm(stack, H, HC, WC))
    mask = (a[3] > 0.05) & (b[3] > 0.05)
    for sh in (3, -3):
        mask &= np.roll(mask, sh, 0) & np.roll(mask, sh, 1)
    assert mask.mean() > 0.1, name
    p = _psnr_masked(a[:3], b[:3], mask)
    assert p > 40.0, (name, p)


@pytest.mark.parametrize("name", ["offset", "rot10_scale1.1", "shear"])
def test_gather_warp_matches_cv2(textured_image, name):
    img = textured_image[:HF, :WF].astype(np.float32)
    H = _to3x3(np.asarray(HS[name]))
    ref = cv2.warpPerspective(img, H, (WC, HC), flags=cv2.INTER_LINEAR)
    ours = np.asarray(W.warp_perspective(jnp.asarray(img), jnp.asarray(H), HC, WC))
    mask = (ref.sum(-1) > 1) & (ours.sum(-1) > 1)
    for sh in (2, -2):
        mask &= np.roll(mask, sh, 0) & np.roll(mask, sh, 1)
    d = (ours - ref)[mask]
    p = 10 * np.log10(255.0**2 / max(float((d**2).mean()), 1e-12))
    assert p > 40.0, (name, p)


def test_two_pass_regime_rejects_extremes():
    big_rot = _to3x3(np.asarray(cv2.getRotationMatrix2D((0, 0), 60, 1.0)))
    assert not bool(W.two_pass_regime_ok(jnp.asarray(big_rot), HC, WC))
    big_persp = np.eye(3, dtype=np.float32)
    big_persp[2, 0] = 1e-3
    assert not bool(W.two_pass_regime_ok(jnp.asarray(big_persp), HC, WC))


def test_blend_semantics(textured_image):
    img = textured_image[:HF, :WF]
    stack = _stack_cm(img)
    canvas = jnp.zeros((3, HC, WC), jnp.float32)
    cw = jnp.zeros((HC, WC), jnp.float32)
    H = jnp.asarray(_to3x3(HS["offset"].copy()))
    c1, w1 = W.warp_blend_fast(canvas, cw, stack[:3], stack[3], H)
    c1n, w1n = np.asarray(c1), np.asarray(w1)
    # frame content copied into empty canvas region
    interior = np.moveaxis(c1n, 0, -1)[130 + 20 : 130 + HF - 20, 120 + 20 : 120 + WF - 20]
    # offset: y=90+40? (H puts frame at (60+?, 90+40)) — just check some content landed
    assert (w1n > 0).sum() > 0.5 * HF * WF
    assert float(np.abs(c1n).max()) > 10
    # blending same frame twice is a no-op in the INTERIOR (alpha mixes
    # identical pixels; the smoothed weights' sum dips below 1 only within
    # ~15 px of the union boundary — reference main.py:894-898 behavior, the
    # 31x31 Gaussian leaks weight outside the mask union)
    c2, w2 = W.warp_blend_fast(c1, w1, stack[:3], stack[3], H)
    m = np.asarray(w2) > 0
    r = W.BLEND_SMOOTH_RADIUS + 2
    er = m.copy()
    for sh in (r, -r):
        er &= np.roll(m, sh, 0) & np.roll(m, sh, 1)
    assert _psnr_masked(np.asarray(c2), c1n, er) > 45


def test_warp_blend_psnr_vs_reference_blend_pipeline(textured_image):
    """End-to-end blend comparison against an OpenCV-style reference composite
    (warpPerspective + distance-transform feathering, reference main.py:861-927)."""
    img = textured_image[:HF, :WF]
    stack = _stack_cm(img)
    canvas = jnp.zeros((3, HC, WC), jnp.float32)
    cw = jnp.zeros((HC, WC), jnp.float32)
    H1 = _to3x3(HS["offset"].copy())
    H2 = H1.copy()
    H2[0, 2] += 25
    H2[1, 2] -= 13
    c, w = W.warp_blend_fast(canvas, cw, stack[:3], stack[3], jnp.asarray(H1))
    c, w = W.warp_blend_fast(c, w, stack[:3], stack[3], jnp.asarray(H2))
    ours = np.moveaxis(np.asarray(c), 0, -1)

    # reference-style composite
    f32 = img.astype(np.float32)
    ref = np.zeros((HC, WC, 3), np.float32)
    w1 = cv2.warpPerspective(f32, H1, (WC, HC))
    ref[w1.sum(-1) > 0] = w1[w1.sum(-1) > 0]
    w2 = cv2.warpPerspective(f32, H2, (WC, HC))
    m_new = (w2.sum(-1) > 0).astype(np.uint8)
    m_old = (ref.sum(-1) > 0).astype(np.uint8)
    overlap = m_new & m_old
    dn = cv2.distanceTransform(m_new * 255, cv2.DIST_L2, 3)
    do = cv2.distanceTransform(m_old * 255, cv2.DIST_L2, 3)
    alpha = dn / (dn + do + 1e-6)
    blended = alpha[..., None] * w2 + (1 - alpha[..., None]) * ref
    out = np.where(overlap[..., None] > 0, blended, np.where(m_new[..., None] > 0, w2, ref))

    mask = (m_new | m_old) > 0
    mask &= np.roll(mask, 4, 0) & np.roll(mask, -4, 0) & np.roll(mask, 4, 1) & np.roll(mask, -4, 1)
    d = (ours - out)[mask]
    p = 10 * np.log10(255.0**2 / max(float((d**2).mean()), 1e-12))
    # feathering profiles differ slightly by design; demand good but not exact match
    assert p > 28.0, p


def test_coarse_union_distance_approximates_edt(rng):
    """Octagonal log-shift chamfer vs scipy's exact Euclidean distance transform."""
    from scipy import ndimage

    import jax.numpy as jnp

    from rtvm_tpu.ops.warp import coarse_union_distance

    mask = np.zeros((60, 72), bool)
    mask[10:40, 12:50] = True
    mask[30:55, 40:68] = True
    ours = np.asarray(coarse_union_distance(jnp.asarray(mask), cell_px=1.0))
    exact = ndimage.distance_transform_edt(mask)
    assert (ours[~mask] == 0).all()
    inner = mask & (exact > 1)
    rel = np.abs(ours[inner] - exact[inner]) / exact[inner]
    # octagonal approximation stays within ~9% of Euclidean
    assert rel.max() < 0.12
    assert rel.mean() < 0.05


def test_analytic_frame_weight_matches_distance():
    import jax.numpy as jnp

    from rtvm_tpu.ops.warp import analytic_frame_weight

    import cv2

    # canvas-units chamfer semantics: must match cv2.distanceTransform of the
    # warped mask, including a canvas-CLIPPED warp (zero pixels only where the
    # canvas actually has them — reference main.py:875-890)
    # fractional translations: the analytic boundary models the MEAN raster
    # phase (+-0.5 px), so exact-integer translations are its worst case and
    # real footage never hits them
    for Hnp in (
        np.array([[1, 0, 20.4], [0, 1, 30.6], [0, 0, 1]], np.float32),
        np.array([[1.25, 0.1, -10.3], [-0.1, 1.25, 80.2], [1e-5, 0, 1]], np.float32),
    ):
        H = jnp.asarray(Hnp)
        w = np.asarray(analytic_frame_weight(H, 40, 60, 128, 128))
        warped = cv2.warpPerspective(np.ones((40, 60), np.float32), Hnp.astype(np.float64), (128, 128))
        mask = (warped > 0).astype(np.uint8)
        ref = cv2.distanceTransform(mask * 255, cv2.DIST_L2, 3)
        m = (mask > 0) & (w > 0) & (ref > 0)
        rel = np.abs(w[m] - ref[m]) / np.maximum(ref[m], 1.0)
        # 5%: on this tiny 128px canvas most in-mask distances are < 10 px, so
        # the +-0.5 px raster-phase floor dominates the relative error; on the
        # real 960x1024 canvas the same code measures ~0.3% median (the
        # 128-frame PSNR regression test in test_pipeline.py covers that).
        assert np.median(rel) < 0.05, np.median(rel)
        assert ((w > 0) == (mask > 0)).mean() > 0.98
    assert w[10, 10] == 0.0  # outside footprint


def test_hole_limited_distance_strided_matches_full(rng):
    """The stride-2 hole chamfer (r5 paint optimization) must track the
    full-res transform to ~1.5 px inside the exact radius and keep the
    beyond-radius plateau intact (so min(w_quad, d) degrades to w_quad there,
    exactly like the full-res version)."""
    from rtvm_tpu.ops.warp import hole_limited_distance, hole_limited_distance_strided

    holes = np.zeros((90, 131), bool)
    pts = rng.randint(0, 90, (12,)), rng.randint(0, 131, (12,))
    holes[pts] = True
    holes[40:44, 60:66] = True  # a blob, not just points
    full = np.asarray(hole_limited_distance(jnp.asarray(holes), radius=16))
    strided = np.asarray(hole_limited_distance_strided(jnp.asarray(holes), radius=16))
    # inside the nominal radius the full-res field is exact — match it there.
    # (beyond it the full-res pass still emits values — row-propagated
    # OVER-estimates the blend nevertheless uses, which caused the r5 -15 dB
    # regression when the strided field plateaued at ~1.3x radius — but they
    # are not ground truth, so out there we compare against the radius-32
    # transform instead, which is exact to 32 px.)
    near = full < 14.0
    err = np.abs(strided - full)[near]
    # any-pooling moves a hole by <= 1 px and the 2x interp adds <= ~1 px
    assert err.max() < 2.5, err.max()
    assert err.mean() < 0.7, err.mean()
    ref32 = np.asarray(hole_limited_distance(jnp.asarray(holes), radius=32))
    mid = (ref32 > 12.0) & (ref32 < 28.0)
    err_mid = np.abs(strided - ref32)[mid]
    assert err_mid.max() < 3.5, err_mid.max()
    # wherever the strided field reports a real value it must never undercut
    # the true distance (chamfer >= 0.955 * Euclid) beyond pool/interp slack —
    # an undercut would bleed hole feathering into clean content
    from scipy import ndimage

    d_euc = ndimage.distance_transform_edt(~holes)
    real = strided < 1e8
    assert (strided[real] >= 0.955 * d_euc[real] - 3.0).all()
    assert (strided[holes] < 2.1).all()  # ~zero (up to any-pool + interp) at holes
