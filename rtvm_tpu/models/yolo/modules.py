"""YOLOv8 building blocks in Flax (NHWC — the TPU-native conv layout).

Functional re-implementation of the architecture used by the reference through
ultralytics (reference main.py:44,51 loads yolo11n/yolov8 checkpoints): Conv-BN-SiLU,
C2f (cross-stage partial with 2 convs + n bottlenecks), SPPF, and the DFL detection
head. All convs run in NHWC so XLA tiles them directly onto the MXU; BatchNorm uses
running stats at inference and can be folded into the conv for serving.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBnSiLU(nn.Module):
    """Conv + BatchNorm + optional SiLU (ultralytics Conv; act=False variants
    share the same conv/BN hyperparameters by construction)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(self.kernel // 2, self.kernel // 2)] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=x.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=x.dtype
        )(x)
        return nn.silu(x) if self.act else x


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True
    expansion: float = 0.5
    kernels: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        y = ConvBnSiLU(hidden, self.kernels[0])(x, train)
        y = ConvBnSiLU(self.out_ch, self.kernels[1])(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage-partial block: split after 1x1, run n bottlenecks, concat all."""

    out_ch: int
    n: int = 1
    shortcut: bool = False
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        y = ConvBnSiLU(2 * hidden, 1)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for _ in range(self.n):
            b = Bottleneck(hidden, self.shortcut, 1.0)(b, train)
            outs.append(b)
        return ConvBnSiLU(self.out_ch, 1)(jnp.concatenate(outs, axis=-1), train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): three chained 5x5 maxpools, concat."""

    out_ch: int
    pool: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnSiLU(hidden, 1)(x, train)
        p = self.pool
        pad = p // 2
        pools = [x]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1], (p, p), strides=(1, 1), padding=[(pad, pad), (pad, pad)]
                )
            )
        return ConvBnSiLU(self.out_ch, 1)(jnp.concatenate(pools, axis=-1), train)


class ConvBn(ConvBnSiLU):
    """Conv + BatchNorm without activation (qkv/pe/proj convs in YOLO11's
    attention use act=False). Subclass keeps the flax module name — and thus
    every existing checkpoint path — while sharing the conv/BN definition."""

    kernel: int = 1
    act: bool = False


class C3k(nn.Module):
    """CSP block with 3 convs and n 3x3 bottlenecks — YOLO11's inner block when
    C3k2 runs with c3k=True (deeper stages)."""

    out_ch: int
    n: int = 2
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        a = ConvBnSiLU(hidden, 1)(x, train)
        b = ConvBnSiLU(hidden, 1)(x, train)
        for _ in range(self.n):
            a = Bottleneck(hidden, self.shortcut, 1.0)(a, train)
        return ConvBnSiLU(self.out_ch, 1)(jnp.concatenate([a, b], axis=-1), train)


class C3k2(nn.Module):
    """YOLO11's faster CSP block: C2f whose n inner modules are C3k blocks
    (c3k=True) or plain 0.5-expansion bottlenecks (c3k=False)."""

    out_ch: int
    n: int = 1
    c3k: bool = False
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        y = ConvBnSiLU(2 * hidden, 1)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        outs = [a, b]
        for _ in range(self.n):
            if self.c3k:
                b = C3k(hidden, 2, self.shortcut)(b, train)
            else:
                b = Bottleneck(hidden, self.shortcut, 0.5)(b, train)
            outs.append(b)
        return ConvBnSiLU(self.out_ch, 1)(jnp.concatenate(outs, axis=-1), train)


class SpatialAttention(nn.Module):
    """YOLO11 multi-head self-attention over the spatial grid with a depthwise
    positional-encoding branch. Tokens are the H*W cells of a stride-32 map
    (~100 at imgsz 320), so plain einsum attention is MXU-friendly — no
    KV-cache/flash machinery needed."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        bsz, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        key_dim = int(head_dim * self.attn_ratio)
        qkv = ConvBn(self.num_heads * (2 * key_dim + head_dim), 1)(x, train)
        qkv = qkv.reshape(bsz, h * w, self.num_heads, 2 * key_dim + head_dim)
        q, k, v = jnp.split(qkv, [key_dim, 2 * key_dim], axis=-1)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (key_dim ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bsz, h, w, self.dim)
        pe = ConvBn(self.dim, 3, groups=self.dim)(
            v.reshape(bsz, h, w, self.dim), train
        )
        return ConvBn(self.dim, 1)(o + pe, train)


class PSABlock(nn.Module):
    """Position-sensitive attention block: residual attention + residual FFN."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + SpatialAttention(self.dim, self.num_heads)(x, train)
        y = ConvBnSiLU(2 * self.dim, 1)(x, train)
        return x + ConvBn(self.dim, 1)(y, train)


class C2PSA(nn.Module):
    """YOLO11's CSP-wrapped stack of PSABlocks on the stride-32 map."""

    out_ch: int
    n: int = 1
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_ch * self.expansion)
        y = ConvBnSiLU(2 * hidden, 1)(x, train)
        a, b = jnp.split(y, 2, axis=-1)
        for _ in range(self.n):
            b = PSABlock(hidden, max(1, hidden // 64))(b, train)
        return ConvBnSiLU(self.out_ch, 1)(jnp.concatenate([a, b], axis=-1), train)


class DetectHead(nn.Module):
    """Decoupled anchor-free head with DFL box regression (reg_max bins/side).

    dw_cls=True uses YOLO11's depthwise-separable classification branch
    (DWConv3x3 + 1x1, twice) instead of v8's dense 3x3 pair."""

    num_classes: int
    reg_max: int = 16
    dw_cls: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        box_outs, cls_outs = [], []
        c2 = max(16, feats[0].shape[-1] // 4, self.reg_max * 4)
        c3 = max(feats[0].shape[-1], min(self.num_classes, 100))
        for f in feats:
            b = ConvBnSiLU(c2, 3)(f, train)
            b = ConvBnSiLU(c2, 3)(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), dtype=f.dtype)(b)
            if self.dw_cls:
                c = ConvBnSiLU(f.shape[-1], 3, groups=f.shape[-1])(f, train)
                c = ConvBnSiLU(c3, 1)(c, train)
                c = ConvBnSiLU(c3, 3, groups=c3)(c, train)
                c = ConvBnSiLU(c3, 1)(c, train)
            else:
                c = ConvBnSiLU(c3, 3)(f, train)
                c = ConvBnSiLU(c3, 3)(c, train)
            c = nn.Conv(self.num_classes, (1, 1), dtype=f.dtype)(c)
            box_outs.append(b)
            cls_outs.append(c)
        return box_outs, cls_outs


def dfl_expectation(box_logits: jnp.ndarray, reg_max: int = 16) -> jnp.ndarray:
    """[..., 4*reg_max] logits -> [..., 4] expected ltrb distances (in stride units)."""
    shape = box_logits.shape[:-1]
    x = box_logits.reshape(shape + (4, reg_max))
    p = nn.softmax(x, axis=-1)
    bins = jnp.arange(reg_max, dtype=p.dtype)
    return jnp.sum(p * bins, axis=-1)
