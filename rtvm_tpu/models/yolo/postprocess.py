"""YOLO decode + fixed-shape NMS, jit-friendly.

Replaces the ultralytics predict() postprocessing the reference relies on
(main.py:118-124,170-177): DFL decode to xyxy, sigmoid class scores, per-image top-K
candidate selection and O(K^2) vectorized IoU suppression — all static shapes.
"""

from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from rtvm_tpu.models.yolo.modules import dfl_expectation


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [K, 4] xyxy in input-image pixels
    scores: jnp.ndarray  # [K]
    classes: jnp.ndarray  # [K] int32
    valid: jnp.ndarray  # [K] bool


def decode_predictions(
    box_logits: Sequence[jnp.ndarray],
    cls_logits: Sequence[jnp.ndarray],
    strides: Tuple[int, ...] = (8, 16, 32),
    reg_max: int = 16,
):
    """Per-scale head outputs (NHWC) -> flat (boxes_xyxy [N,4], scores [N,C])."""
    all_boxes, all_scores = [], []
    for bl, cl, s in zip(box_logits, cls_logits, strides):
        b, h, w, _ = bl.shape
        d = dfl_expectation(bl, reg_max)  # [B, H, W, 4] ltrb in stride units
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5)[None, :, None]
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, None, :]
        x1 = (cx - d[..., 0]) * s
        y1 = (cy - d[..., 1]) * s
        x2 = (cx + d[..., 2]) * s
        y2 = (cy + d[..., 3]) * s
        boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(b, h * w, 4)
        scores = jax.nn.sigmoid(cl).reshape(b, h * w, -1)
        all_boxes.append(boxes)
        all_scores.append(scores)
    return jnp.concatenate(all_boxes, axis=1), jnp.concatenate(all_scores, axis=1)


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    conf_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    max_detections: int = 300,
    class_aware: bool = True,
) -> Detections:
    """Single-image NMS with static output size. boxes [N,4], scores [N,C]."""
    cls = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    conf = jnp.max(scores, axis=-1)
    conf = jnp.where(conf >= conf_threshold, conf, 0.0)

    k = min(max_detections, boxes.shape[0])
    top_conf, idx = jax.lax.top_k(conf, k)
    top_boxes = boxes[idx]
    top_cls = cls[idx]

    iou = _iou_matrix(top_boxes)
    if class_aware:
        iou = iou * (top_cls[:, None] == top_cls[None, :])

    # Greedy suppression by Jacobi fixpoint instead of a K-step sequential
    # loop (TPU: K=300 tiny sequential iterations cost ~ms per frame; whole
    # [K, K] sweeps are microseconds). The greedy rule
    #   keep[i] = keep0[i] and no surviving higher-scored j overlaps i
    # is a stratified recursion on the rank-ordered DAG, so it has a unique
    # solution and the parallel sweep keep <- keep0 & ~any(sup & keep) is
    # exact for all boxes whose suppression-chain depth <= #sweeps; iterating
    # to fixpoint (typically 3-6 sweeps, bounded by k) IS the greedy result.
    sup = (iou > iou_threshold) & (jnp.arange(k)[:, None] < jnp.arange(k)[None, :])
    keep0 = top_conf > 0.0

    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < k)

    def sweep(state):
        keep, _, it = state
        nxt = keep0 & ~jnp.any(sup & keep[:, None], axis=0)
        return nxt, keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, sweep, (keep0, ~keep0, 0))
    return Detections(
        boxes=top_boxes, scores=jnp.where(keep, top_conf, 0.0), classes=top_cls, valid=keep
    )


def letterbox_params(h: int, w: int, imgsz) -> Tuple[float, int, int, int, int]:
    """Aspect-preserving resize-with-pad geometry (scale, new_h, new_w, pad_y, pad_x).

    imgsz is a square side (int) or an explicit (out_h, out_w) — rectangular
    targets skip the square letterbox's dead padding rows (a 360x640 frame into
    384x640 instead of 640x640 runs the backbone on 40% fewer pixels)."""
    th, tw = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    py, px = (th - nh) // 2, (tw - nw) // 2
    return scale, nh, nw, py, px


def preprocess_frames(frames_u8: jnp.ndarray, imgsz) -> Tuple[jnp.ndarray, float, int, int]:
    """[B, H, W, 3] BGR uint8 -> [B, th, tw, 3] RGB float letterboxed 0..1.
    imgsz: square side (int) or explicit (out_h, out_w)."""
    b, h, w, _ = frames_u8.shape
    th, tw = (imgsz, imgsz) if isinstance(imgsz, int) else imgsz
    scale, nh, nw, py, px = letterbox_params(h, w, imgsz)
    x = frames_u8[..., ::-1].astype(jnp.float32) / 255.0  # BGR -> RGB
    x = jax.image.resize(x, (b, nh, nw, 3), method="bilinear")
    x = jnp.pad(x, ((0, 0), (py, th - nh - py), (px, tw - nw - px), (0, 0)),
                constant_values=0.447)
    return x, scale, py, px


def unletterbox_boxes(boxes: jnp.ndarray, scale: float, py: int, px: int) -> jnp.ndarray:
    """Map boxes from letterboxed coords back to original image pixels."""
    return (boxes - jnp.array([px, py, px, py], boxes.dtype)) / scale
