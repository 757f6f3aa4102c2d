"""Pallas kernel tests (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from rtvm_tpu.ops.pallas_blend import blend_pallas
from rtvm_tpu.ops.warp import _blend_cm


def test_pallas_blend_matches_jnp(rng):
    hc, wc = 256, 384
    canvas = jnp.asarray(rng.rand(3, hc, wc).astype(np.float32) * 255)
    cw = jnp.asarray((rng.rand(hc, wc) * (rng.rand(hc, wc) > 0.3)).astype(np.float32))
    new = jnp.asarray(rng.rand(3, hc, wc).astype(np.float32) * 255)
    nw = jnp.asarray((rng.rand(hc, wc) * (rng.rand(hc, wc) > 0.4)).astype(np.float32))

    ref = _blend_cm(canvas, cw, new, nw)
    out, ow = blend_pallas(canvas, cw, new, nw, interpret=True)
    assert np.allclose(np.asarray(out), np.asarray(ref.canvas), atol=1e-4)
    assert np.allclose(np.asarray(ow), np.asarray(ref.weight), atol=1e-6)
