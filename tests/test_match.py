"""Descriptor matching tests against numpy brute-force oracles."""

import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops import match


def _np_hamming(a, b):
    x = a[:, None, :] ^ b[None, :, :]
    return np.array([[bin(int(v)).count("1") for v in row] for row in
                     x.reshape(x.shape[0] * x.shape[1], -1).sum(axis=-1).reshape(x.shape[0], x.shape[1])])


def test_hamming_distance_matrix(rng):
    a = rng.randint(0, 2**32, (12, 2), dtype=np.uint64).astype(np.uint32)
    b = rng.randint(0, 2**32, (15, 2), dtype=np.uint64).astype(np.uint32)
    d = np.asarray(match.hamming_distance_matrix(jnp.asarray(a), jnp.asarray(b)))
    ref = np.zeros((12, 15), int)
    for i in range(12):
        for j in range(15):
            ref[i, j] = sum(bin(int(a[i, k]) ^ int(b[j, k])).count("1") for k in range(2))
    assert (d == ref).all()


def test_crosscheck_mutual_nearest(rng):
    ka, kb = 30, 40
    a = rng.randint(0, 2**32, (ka, 8), dtype=np.uint64).astype(np.uint32)
    b = rng.randint(0, 2**32, (kb, 8), dtype=np.uint64).astype(np.uint32)
    va = np.ones(ka, bool)
    vb = np.ones(kb, bool)
    va[5] = False
    vb[7] = False
    m = match.match_hamming_crosscheck(jnp.asarray(a), jnp.asarray(va), jnp.asarray(b), jnp.asarray(vb))
    d = np.zeros((ka, kb), int)
    for i in range(ka):
        for j in range(kb):
            d[i, j] = sum(bin(int(a[i, k]) ^ int(b[j, k])).count("1") for k in range(8))
    d[~va] = 10**6
    d[:, ~vb] = 10**6
    ti = np.asarray(m.train_idx)
    mv = np.asarray(m.valid)
    for i in range(ka):
        if mv[i]:
            j = ti[i]
            assert d[i].argmin() == j
            assert d[:, j].argmin() == i
            assert va[i] and vb[j]
    assert not mv[5]


def test_l2_ratio_test(rng):
    kt = 50
    t = rng.randn(kt, 128).astype(np.float32)
    # queries: near-copies of train rows (should match), plus ambiguous ones
    q = t[:20] + rng.randn(20, 128).astype(np.float32) * 0.01
    vq = np.ones(20, bool)
    vt = np.ones(kt, bool)
    m = match.match_l2_ratio(jnp.asarray(q), jnp.asarray(vq), jnp.asarray(t), jnp.asarray(vt), ratio=0.7)
    ti = np.asarray(m.train_idx)
    mv = np.asarray(m.valid)
    assert mv[:20].mean() > 0.9
    assert (ti[:20][mv[:20]] == np.arange(20)[mv[:20]]).all()
    # duplicated train rows make matches ambiguous -> ratio test must reject
    t2 = np.concatenate([t, t[:10] + 1e-6], axis=0)
    vt2 = np.ones(kt + 10, bool)
    m2 = match.match_l2_ratio(jnp.asarray(q[:10]), jnp.asarray(vq[:10]), jnp.asarray(t2), jnp.asarray(vt2), ratio=0.7)
    assert np.asarray(m2.valid)[:10].sum() == 0
