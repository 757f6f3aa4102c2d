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
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from rtvm_tpu.models.yolo.modules import C2f, ConvBnSiLU, DetectHead, SPPF

# depth multiple, width multiple, ratio (last-stage channel ratio)
VARIANTS = {
    "yolov8n": (1 / 3, 0.25, 2.0),
    "yolov8s": (1 / 3, 0.50, 2.0),
    "yolov8m": (2 / 3, 0.75, 1.5),
    "yolov8l": (1.0, 1.00, 1.0),
    "yolov8x": (1.0, 1.25, 1.0),
    # yolo11n in the reference is served by the closest v8 config here
    "yolo11n": (1 / 3, 0.25, 2.0),
}


def _ch(w: float, c: int) -> int:
    return max(16, int(round(c * w / 8)) * 8)


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


class YOLOv8(nn.Module):
    cfg: YoloConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [B, H, W, 3] float (0..1 normalized). Returns (box_logits, cls_logits)
        per scale, NHWC."""
        feats = yolo_features(self.cfg, x, train)
        return DetectHead(self.cfg.num_classes, self.cfg.reg_max)(feats, train)


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
