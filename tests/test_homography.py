"""Homography estimation tests: DLT exactness, RANSAC outlier rejection, validation
thresholds (behavioral parity with reference main.py:761-834), smoothing weights."""

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.geometry import homography as geo


def _apply(H, pts):
    p = np.concatenate([pts, np.ones((len(pts), 1))], axis=1) @ H.T
    return p[:, :2] / p[:, 2:3]


def test_dlt_4pt_recovers_exact_homography(rng):
    H_true = np.array([[1.1, 0.05, 10.0], [-0.03, 0.95, -6.0], [1e-4, -5e-5, 1.0]])
    src = rng.rand(4, 2).astype(np.float32) * 100
    dst = _apply(H_true, src).astype(np.float32)
    H = np.asarray(geo.dlt_homography_4pt(jnp.asarray(src), jnp.asarray(dst)))
    est = _apply(H, src)
    assert np.abs(est - dst).max() < 1e-2


def test_ransac_rejects_outliers(rng):
    H_true = np.array([[1.02, 0.01, 5.0], [-0.02, 0.99, -12.0], [0.0, 0.0, 1.0]])
    n = 200
    src = (rng.rand(n, 2) * 300).astype(np.float32)
    dst = _apply(H_true, src).astype(np.float32)
    dst += rng.randn(n, 2).astype(np.float32) * 0.3
    n_out = 80
    dst[:n_out] = rng.rand(n_out, 2) * 300  # gross outliers
    valid = np.ones(n, bool)
    res = geo.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jax.random.PRNGKey(0)
    )
    assert bool(res.ok)
    assert int(res.num_inliers) > 100
    H = np.asarray(res.H)
    est = _apply(H, src[n_out:])
    err = np.sqrt(((est - dst[n_out:]) ** 2).sum(-1))
    assert np.median(err) < 1.0


def test_ransac_fails_gracefully_with_too_few_matches(rng):
    src = (rng.rand(10, 2) * 100).astype(np.float32)
    dst = src.copy()
    valid = np.zeros(10, bool)
    valid[:3] = True  # below min_matches=4
    res = geo.ransac_homography(
        jnp.asarray(src), jnp.asarray(dst), jnp.asarray(valid), jax.random.PRNGKey(0)
    )
    assert not bool(res.ok)
    assert np.allclose(np.asarray(res.H), np.eye(3))


def test_validate_homography_thresholds():
    """Thresholds from reference main.py:99-101,775-799."""
    I = jnp.eye(3)
    assert bool(geo.validate_homography(I))
    # translation > 50 px rejected
    H = I.at[0, 2].set(60.0)
    assert not bool(geo.validate_homography(H))
    H = I.at[0, 2].set(30.0).at[1, 2].set(30.0)  # norm ~42 ok
    assert bool(geo.validate_homography(H))
    # scale deviation > 0.3 rejected
    H = jnp.diag(jnp.array([1.4, 1.4, 1.0]))
    assert not bool(geo.validate_homography(H))
    H = jnp.diag(jnp.array([1.25, 1.25, 1.0]))
    assert bool(geo.validate_homography(H))
    # perspective terms > 1e-3 rejected
    H = I.at[2, 0].set(2e-3)
    assert not bool(geo.validate_homography(H))
    # NaN rejected
    H = I.at[0, 0].set(jnp.nan)
    assert not bool(geo.validate_homography(H))


def test_smoothing_matches_reference_formula():
    """Weighted elementwise average with linspace(0.5, 1.0, n) weights
    (reference main.py:803-834)."""
    table = geo.smoothing_weights(5)
    hbuf = jnp.tile(jnp.eye(3)[None], (5, 1, 1)).astype(jnp.float32)
    count = jnp.int32(0)
    history = []
    rngg = np.random.RandomState(0)
    for i in range(8):
        H = np.eye(3, dtype=np.float32)
        H[0, 2] = rngg.randn() * 10
        history.append(H.copy())
        hbuf, count, H_s = geo.smooth_homography_step(
            hbuf, count, jnp.asarray(H), table
        )
        # reference implementation
        window = history[-5:]
        if len(window) < 2:
            expected = H
        else:
            w = np.linspace(0.5, 1.0, len(window))
            w = w / w.sum()
            expected = sum(wi * hi for wi, hi in zip(w, window))
        assert np.abs(np.asarray(H_s) - expected).max() < 1e-5


def test_transform_corners_identity():
    c = np.asarray(geo.transform_corners(100, 50, jnp.eye(3)))
    assert np.allclose(c, [[0, 0], [100, 0], [100, 50], [0, 50]])
