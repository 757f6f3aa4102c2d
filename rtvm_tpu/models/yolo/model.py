"""YOLOv8 detector family (n/s/m/l/x) in Flax, NHWC end-to-end.

Mirrors the capability surface the reference gets from ultralytics checkpoints
(yolo11n/yolov8n..x, reference main.py:44,51,118): CSP backbone -> SPPF -> PAN neck ->
decoupled DFL head over strides (8, 16, 32). Weight conversion from ultralytics .pt
files lives in weights.py; with no checkpoint the model runs randomly initialized
(the bundled weights were stripped from the reference snapshot per
.MISSING_LARGE_BLOBS).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rtvm_tpu.models.yolo.modules import C2PSA, C2f, C3k2, ConvBnSiLU, DetectHead, SPPF

# depth multiple, width multiple, ratio (last-stage channel ratio)
VARIANTS = {
    "yolov8n": (1 / 3, 0.25, 2.0),
    "yolov8s": (1 / 3, 0.50, 2.0),
    "yolov8m": (2 / 3, 0.75, 1.5),
    "yolov8l": (1.0, 1.00, 1.0),
    "yolov8x": (1.0, 1.25, 1.0),
}

# YOLO11 family (reference main.py:44-51 loads yolo11n/s/l): depth multiple,
# width multiple, max channels. Genuine 11-series trunk: C3k2 CSP blocks +
# C2PSA attention on P5 + depthwise-separable cls head (see yolo11_features).
VARIANTS11 = {
    "yolo11n": (0.50, 0.25, 1024),
    "yolo11s": (0.50, 0.50, 1024),
    "yolo11m": (0.50, 1.00, 512),
    "yolo11l": (1.00, 1.00, 512),
    "yolo11x": (1.00, 1.50, 512),
}


def _make_divisible(x: float) -> int:
    """Ultralytics make_divisible(x, 8) semantics (ceil, not round) so any
    future custom width multiple converts checkpoints without shape drift."""
    return max(16, math.ceil(x / 8) * 8)


def _ch(w: float, c: int) -> int:
    return _make_divisible(c * w)


# c3k flag per ultralytics yolo11.yaml C3k2 layer index (backbone 2/4/6/8,
# neck 13/16/19/22): n/s run plain bottlenecks except at 6/8/22; m/l/x
# ("deep") use nested C3k everywhere. SINGLE source of truth shared by
# yolo11_features and the checkpoint converter (weights.c3k_layer_indices).
_C3K2_LAYERS = ("2", "4", "6", "8", "13", "16", "19", "22")
_C3K_ALWAYS = frozenset({"6", "8", "22"})


def yolo11_c3k_flags(variant: str) -> dict:
    deep = variant[-1] in "mlx"
    return {i: deep or i in _C3K_ALWAYS for i in _C3K2_LAYERS}


def _d(dm: float, n: int) -> int:
    return max(1, round(n * dm))


@dataclasses.dataclass(frozen=True)
class YoloConfig:
    variant: str = "yolov8n"
    num_classes: int = 80
    reg_max: int = 16
    strides: Tuple[int, ...] = (8, 16, 32)


def yolo_features(cfg: "YoloConfig", x, train: bool):
    """CSP backbone -> SPPF -> PAN neck. Returns [n3, m4, m5] at strides 8/16/32.

    Plain function called from inside a compact __call__ so YOLOv8 and the
    open-vocab YOLOWorld (world.py) share one trunk; submodule creation order is
    unchanged, so pre-refactor checkpoints keep loading."""
    dm, wm, r = VARIANTS[cfg.variant]
    c1, c2, c3, c4 = _ch(wm, 64), _ch(wm, 128), _ch(wm, 256), _ch(wm, 512)
    c5 = _ch(wm * r, 512)

    # Backbone
    x = ConvBnSiLU(c1, 3, 2)(x, train)  # P1
    x = ConvBnSiLU(c2, 3, 2)(x, train)  # P2
    x = C2f(c2, _d(dm, 3), shortcut=True)(x, train)
    x = ConvBnSiLU(c3, 3, 2)(x, train)  # P3
    p3 = C2f(c3, _d(dm, 6), shortcut=True)(x, train)
    x = ConvBnSiLU(c4, 3, 2)(p3, train)  # P4
    p4 = C2f(c4, _d(dm, 6), shortcut=True)(x, train)
    x = ConvBnSiLU(c5, 3, 2)(p4, train)  # P5
    x = C2f(c5, _d(dm, 3), shortcut=True)(x, train)
    p5 = SPPF(c5)(x, train)

    # PAN neck
    u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
    n4 = C2f(c4, _d(dm, 3))(u4, train)
    u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
    n3 = C2f(c3, _d(dm, 3))(u3, train)  # -> stride 8
    d4 = jnp.concatenate([ConvBnSiLU(c3, 3, 2)(n3, train), n4], axis=-1)
    m4 = C2f(c4, _d(dm, 3))(d4, train)  # -> stride 16
    d5 = jnp.concatenate([ConvBnSiLU(c4, 3, 2)(m4, train), p5], axis=-1)
    m5 = C2f(c5, _d(dm, 3))(d5, train)  # -> stride 32
    return [n3, m4, m5]


def yolo11_features(cfg: "YoloConfig", x, train: bool):
    """YOLO11 trunk (C3k2 backbone + SPPF + C2PSA + PAN neck), strides 8/16/32.

    Mirrors ultralytics' yolo11.yaml graph (the reference's yolo11n/s/l person
    detector, main.py:44-51,118): e=0.25 C3k2 blocks early, c3k=True blocks at
    P4/P5 (and throughout the neck for m/l/x), attention only on the stride-32
    map where the token count stays tiny."""
    dm, wm, mc = VARIANTS11[cfg.variant]

    def ch(c: int) -> int:
        return _make_divisible(min(c, mc) * wm)

    def rep(n: int) -> int:
        return max(1, round(n * dm))

    c3k = yolo11_c3k_flags(cfg.variant)  # shared with the weight converter
    c3, c4, c5 = ch(256), ch(512), ch(1024)

    # Backbone
    x = ConvBnSiLU(ch(64), 3, 2)(x, train)  # P1
    x = ConvBnSiLU(ch(128), 3, 2)(x, train)  # P2
    x = C3k2(c3, rep(2), c3k=c3k["2"], expansion=0.25)(x, train)
    x = ConvBnSiLU(c3, 3, 2)(x, train)  # P3
    p3 = C3k2(c4, rep(2), c3k=c3k["4"], expansion=0.25)(x, train)
    x = ConvBnSiLU(c4, 3, 2)(p3, train)  # P4
    p4 = C3k2(c4, rep(2), c3k=c3k["6"])(x, train)
    x = ConvBnSiLU(c5, 3, 2)(p4, train)  # P5
    x = C3k2(c5, rep(2), c3k=c3k["8"])(x, train)
    x = SPPF(c5)(x, train)
    p5 = C2PSA(c5, rep(2))(x, train)

    # PAN neck
    u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
    n4 = C3k2(c4, rep(2), c3k=c3k["13"])(u4, train)
    u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
    n3 = C3k2(c3, rep(2), c3k=c3k["16"])(u3, train)  # -> stride 8
    d4 = jnp.concatenate([ConvBnSiLU(c3, 3, 2)(n3, train), n4], axis=-1)
    m4 = C3k2(c4, rep(2), c3k=c3k["19"])(d4, train)  # -> stride 16
    d5 = jnp.concatenate([ConvBnSiLU(c4, 3, 2)(m4, train), p5], axis=-1)
    m5 = C3k2(c5, rep(2), c3k=c3k["22"])(d5, train)  # -> stride 32
    return [n3, m4, m5]


class YOLOv8(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] float (0..1 normalized). Returns (box_logits, cls_logits)
        per scale, NHWC."""
        is11 = self.cfg.variant in VARIANTS11
        feats = (yolo11_features if is11 else yolo_features)(self.cfg, x, train)
        return DetectHead(self.cfg.num_classes, self.cfg.reg_max, dw_cls=is11)(
            feats, train
        )


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


def build_yolo(variant: str = "yolov8n", num_classes: int = 80, imgsz: int = 640, seed: int = 0):
    """Construct model + init params. Returns (model, variables)."""
    cfg = YoloConfig(variant=variant, num_classes=num_classes)
    model = YOLOv8(cfg)
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, imgsz, imgsz, 3), jnp.float32)
    variables = model.init(rng, x, train=False)
    return model, variables
