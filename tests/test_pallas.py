"""Pallas warp kernel tests (interpret mode on the CPU backend).

The fused two-pass warp (ops/pallas_warp.py) is the production paint tier on
TPU; here it is validated against cv2.warpPerspective and the XLA two-pass
path on small shapes."""

import numpy as np
import jax.numpy as jnp
import pytest

from rtvm_tpu.ops import warp as W
from rtvm_tpu.ops.pallas_warp import warp_two_pass_pallas


@pytest.fixture(scope="module")
def small_image(rng=None):
    import cv2

    r = np.random.RandomState(7)
    img = r.randint(0, 255, (96, 160, 3)).astype(np.uint8)
    return cv2.GaussianBlur(img, (0, 0), 1.0)


CASES = {
    "translate": np.array([[1, 0, 20.3], [0, 1, 33.7], [0, 0, 1]], np.float32),
    "scale_down": np.array([[0.93, 0, 25], [0, 0.93, 30], [0, 0, 1]], np.float32),
    "rot2_persp": np.array(
        [
            [0.98 * np.cos(0.03), -0.98 * np.sin(0.03), 30],
            [0.98 * np.sin(0.03), 0.98 * np.cos(0.03), 40],
            [1e-5, -8e-6, 1],
        ],
        np.float32,
    ),
}


@pytest.mark.parametrize("name", list(CASES))
def test_pallas_warp_matches_cv2(small_image, name):
    import cv2

    hc, wc = 192, 256
    Hm = CASES[name]
    stack = jnp.moveaxis(jnp.asarray(small_image, jnp.float32), -1, 0)
    assert bool(W.pallas_regime_ok(jnp.asarray(Hm), hc, wc, 96, 160)), name

    out = np.asarray(warp_two_pass_pallas(stack, jnp.asarray(Hm), hc, wc, interpret=True))
    ref = cv2.warpPerspective(
        small_image.astype(np.float32), Hm.astype(np.float64), (wc, hc)
    )
    ref = np.moveaxis(ref, -1, 0)
    mask = ref.sum(0) > 0
    for sh in (2, -2):
        mask &= np.roll(mask, sh, 0) & np.roll(mask, sh, 1)
    err = np.abs(out - ref)[:, mask]
    mse = float((err**2).mean())
    psnr = 10 * np.log10(255.0**2 / max(mse, 1e-12))
    assert psnr > 55.0, (name, psnr)  # bf16 matmul floor is ~60+ dB
    # border handling (zero-blend) must match too: full-image error stays small
    assert float(np.abs(out - ref).max()) < 20.0, name


def test_pallas_warp_matches_xla_two_pass(small_image):
    hc, wc = 192, 256
    Hm = CASES["rot2_persp"]
    stack = jnp.moveaxis(jnp.asarray(small_image, jnp.float32), -1, 0)
    a = np.asarray(warp_two_pass_pallas(stack, jnp.asarray(Hm), hc, wc, interpret=True))
    b = np.asarray(W.warp_two_pass(stack, jnp.asarray(Hm), hc, wc))
    mask = (np.abs(b).sum(0) > 0)
    assert np.abs(a - b)[:, mask].mean() < 0.5


def test_pallas_regime_rejects_large_rotation():
    # 30 deg rotation exceeds the per-block shear bound -> XLA tier must take over
    th = np.radians(30)
    Hm = np.array(
        [[np.cos(th), -np.sin(th), 50], [np.sin(th), np.cos(th), 10], [0, 0, 1]],
        np.float32,
    )
    assert not bool(W.pallas_regime_ok(jnp.asarray(Hm), 192, 256, 96, 160))
    # ... but the XLA two-pass regime also bounds rotation via slopes; the
    # gather fallback remains the exact catch-all.


@pytest.mark.parametrize("dynroll", [True, False])
def test_pallas_patches_match_xla_extractor(dynroll):
    """The Pallas VMEM patch extractor (interpret mode) must cut byte-identical
    patches to the XLA interleave path (both are pure integer-aligned copies) —
    both the dynamic-rotate kernel (round 4) and the static bit-gated-roll
    fallback."""
    from rtvm_tpu.ops.features import sift as SF
    from rtvm_tpu.ops.pallas_patches import extract_patches_pallas

    rng = np.random.RandomState(3)
    s, h, w = 3, 64, 96
    g = rng.rand(s, h, w).astype(np.float32)
    q = 37  # not a multiple of the kernel's per-program block
    xy = np.stack([rng.randint(0, w, q), rng.randint(0, h, q)], -1).astype(np.float32)
    lvl = rng.randint(1, s + 1, q).astype(np.int32)

    ref = np.asarray(SF._extract_level_patches(jnp.asarray(g), jnp.asarray(xy), jnp.asarray(lvl)))
    half = SF.PATCH // 2
    ys = np.clip(xy[:, 1].astype(np.int32) - half, 0, h - SF.PATCH - 2) + (lvl - 1) * h
    xs = np.clip(xy[:, 0].astype(np.int32) - half, 0, w - SF.PATCH)
    out = np.asarray(
        extract_patches_pallas(
            jnp.asarray(g.reshape(s * h, w)), jnp.asarray(ys), jnp.asarray(xs),
            SF.PATCH, interpret=True, dynroll=dynroll,
        )
    )
    np.testing.assert_array_equal(out, ref)
