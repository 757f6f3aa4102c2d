"""Lightweight monocular depth network in Flax (NHWC).

This framework's own depth model: a compact encoder-decoder (strided convs + skip
connections) predicting inverse-depth, used when no HuggingFace depth checkpoint is
available locally (the environment has no network egress). Architecture is sized so a
640x480 frame runs in a few ms on one TPU chip.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Block(nn.Module):
    ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ch, (3, 3), strides=(self.stride, self.stride))(x)
        x = nn.GroupNorm(num_groups=min(8, self.ch))(x)
        return nn.silu(x)


class DepthNet(nn.Module):
    base: int = 32

    @nn.compact
    def __call__(self, x):
        """x [B, H, W, 3] float 0..1 -> depth [B, H, W, 1] (relative, 1 = near)."""
        b = self.base
        e1 = _Block(b)(x)
        e2 = _Block(b * 2, 2)(e1)
        e3 = _Block(b * 4, 2)(e2)
        e4 = _Block(b * 8, 2)(e3)
        e5 = _Block(b * 8, 2)(e4)  # /16: terrain height is low-frequency
        m = _Block(b * 8)(e5)
        # Global scene context: affine-relative depth needs a whole-image
        # reference (which surface is "ground"); a mean-pooled feature
        # broadcast supplies it without attention-sized cost.
        g = jnp.mean(m, axis=(1, 2), keepdims=True)
        m = m + nn.silu(nn.Dense(b * 8)(g))

        def up(z, ref):
            bt, h, w, _ = ref.shape
            return jax.image.resize(z, (z.shape[0], h, w, z.shape[-1]), "bilinear")

        d4 = _Block(b * 8)(jnp.concatenate([up(m, e4), e4], -1))
        d3 = _Block(b * 4)(jnp.concatenate([up(d4, e3), e3], -1))
        d2 = _Block(b * 2)(jnp.concatenate([up(d3, e2), e2], -1))
        d1 = _Block(b)(jnp.concatenate([up(d2, e1), e1], -1))
        out = nn.Conv(1, (3, 3))(d1)
        return nn.sigmoid(out)


def build_depthnet(seed: int = 0, example_hw=(240, 320)):
    model = DepthNet()
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, example_hw[0], example_hw[1], 3))
    )
    return model, variables
