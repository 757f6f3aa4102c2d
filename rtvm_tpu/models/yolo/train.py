"""YOLO training step — loss, optimizer step, and dp x tp sharded jit.

The reference only runs inference (ultralytics predict); training support is part of
making this a complete framework. Loss follows the YOLOv8 recipe in simplified form:
center-prior assignment (targets assigned to cells whose anchor point falls inside the
box, on the best-matching scale), BCE classification, CIoU box loss, and DFL
distribution loss.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from rtvm_tpu.models.yolo.model import YOLOv8
from rtvm_tpu.models.yolo.modules import dfl_expectation


class TrainState(NamedTuple):
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jnp.ndarray


class Targets(NamedTuple):
    """Padded ground truth: boxes [B, M, 4] xyxy px, classes [B, M], valid [B, M]."""

    boxes: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


def _ciou(box1, box2):
    """Complete-IoU between [..., 4] xyxy boxes."""
    x1 = jnp.maximum(box1[..., 0], box2[..., 0])
    y1 = jnp.maximum(box1[..., 1], box2[..., 1])
    x2 = jnp.minimum(box1[..., 2], box2[..., 2])
    y2 = jnp.minimum(box1[..., 3], box2[..., 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    a1 = jnp.maximum(box1[..., 2] - box1[..., 0], 0) * jnp.maximum(box1[..., 3] - box1[..., 1], 0)
    a2 = jnp.maximum(box2[..., 2] - box2[..., 0], 0) * jnp.maximum(box2[..., 3] - box2[..., 1], 0)
    union = a1 + a2 - inter
    iou = inter / jnp.maximum(union, 1e-9)
    # enclosing box diagonal + center distance
    ex1 = jnp.minimum(box1[..., 0], box2[..., 0])
    ey1 = jnp.minimum(box1[..., 1], box2[..., 1])
    ex2 = jnp.maximum(box1[..., 2], box2[..., 2])
    ey2 = jnp.maximum(box1[..., 3], box2[..., 3])
    c2 = (ex2 - ex1) ** 2 + (ey2 - ey1) ** 2 + 1e-9
    cx1 = (box1[..., 0] + box1[..., 2]) / 2
    cy1 = (box1[..., 1] + box1[..., 3]) / 2
    cx2 = (box2[..., 0] + box2[..., 2]) / 2
    cy2 = (box2[..., 1] + box2[..., 3]) / 2
    rho2 = (cx1 - cx2) ** 2 + (cy1 - cy2) ** 2
    w1 = jnp.maximum(box1[..., 2] - box1[..., 0], 1e-9)
    h1 = jnp.maximum(box1[..., 3] - box1[..., 1], 1e-9)
    w2 = jnp.maximum(box2[..., 2] - box2[..., 0], 1e-9)
    h2 = jnp.maximum(box2[..., 3] - box2[..., 1], 1e-9)
    v = (4 / jnp.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / jnp.maximum(1 - iou + v, 1e-9)
    return iou - rho2 / c2 - alpha * v


def yolo_loss(model: YOLOv8, variables, images, targets: Targets, train: bool = True):
    """images [B, S, S, 3]; returns (loss, (batch_stats_updates, metrics))."""
    strides = model.cfg.strides
    reg_max = model.cfg.reg_max

    out, mutated = model.apply(
        variables, images, train=train, mutable=["batch_stats"] if train else []
    ) if train else (model.apply(variables, images, train=False), {})
    box_logits, cls_logits = out

    total_cls = 0.0
    total_box = 0.0
    total_dfl = 0.0
    total_pos = 1e-6
    for bl, cl, s in zip(box_logits, cls_logits, strides):
        b, h, w, _ = bl.shape
        cy = (jnp.arange(h, dtype=jnp.float32) + 0.5) * s
        cx = (jnp.arange(w, dtype=jnp.float32) + 0.5) * s
        pcx = jnp.broadcast_to(cx[None, None, :], (b, h, w))
        pcy = jnp.broadcast_to(cy[None, :, None], (b, h, w))

        tb = targets.boxes  # [B, M, 4]
        bcx = (tb[..., 0] + tb[..., 2]) / 2
        bcy = (tb[..., 1] + tb[..., 3]) / 2
        inside = (
            (pcx[..., None] > tb[:, None, None, :, 0])
            & (pcx[..., None] < tb[:, None, None, :, 2])
            & (pcy[..., None] > tb[:, None, None, :, 1])
            & (pcy[..., None] < tb[:, None, None, :, 3])
        )  # [B, H, W, M]
        # A box smaller than one cell can contain no anchor center at all; the
        # cell whose center is nearest the box center is always a candidate too
        # (crucial for ~8px 'person' objects at stride 8 — without it they are
        # never assigned and the class never trains).
        nearest = (jnp.abs(pcx[..., None] - bcx[:, None, None, :]) <= s / 2) & (
            jnp.abs(pcy[..., None] - bcy[:, None, None, :]) <= s / 2
        )
        # scale gate: box size appropriate for this stride; the finest level has
        # no lower bound so sub-2-stride objects still train.
        sz = jnp.sqrt(
            jnp.maximum(tb[..., 2] - tb[..., 0], 1) * jnp.maximum(tb[..., 3] - tb[..., 1], 1)
        )  # [B, M]
        lo = 0.0 if s == min(strides) else s * 2
        gate = (sz[:, None, None, :] >= lo) & (sz[:, None, None, :] < s * 16)
        cand = (inside | nearest) & gate & targets.valid[:, None, None, :]
        # each cell takes its smallest matching target
        area = jnp.maximum(tb[..., 2] - tb[..., 0], 1) * jnp.maximum(tb[..., 3] - tb[..., 1], 1)
        cost = jnp.where(cand, area[:, None, None, :], jnp.inf)
        tgt_idx = jnp.argmin(cost, axis=-1)  # [B, H, W]
        assigned = jnp.any(cand, axis=-1)  # [B, H, W]

        tgt_box = jnp.take_along_axis(tb, tgt_idx[..., None].reshape(b, -1, 1), axis=1).reshape(b, h, w, 4)
        tgt_cls = jnp.take_along_axis(targets.classes, tgt_idx.reshape(b, -1), axis=1).reshape(b, h, w)

        # classification: one-hot where assigned, zeros elsewhere. Width follows
        # the logits (closed-set: cfg.num_classes; world head: #prompts).
        onehot = jax.nn.one_hot(tgt_cls, cl.shape[-1]) * assigned[..., None]
        cls_l = optax.sigmoid_binary_cross_entropy(cl, onehot).sum(-1)
        total_cls += cls_l.mean() * (h * w)

        # box + dfl on assigned cells
        d = dfl_expectation(bl, reg_max)  # ltrb stride units
        px1 = pcx - d[..., 0] * s
        py1 = pcy - d[..., 1] * s
        px2 = pcx + d[..., 2] * s
        py2 = pcy + d[..., 3] * s
        pred_box = jnp.stack([px1, py1, px2, py2], axis=-1)
        ciou = _ciou(pred_box, tgt_box)
        total_box += jnp.sum((1.0 - ciou) * assigned)

        # DFL: regress each side's distance distribution to the target distance
        t_ltrb = jnp.stack(
            [
                (pcx - tgt_box[..., 0]) / s,
                (pcy - tgt_box[..., 1]) / s,
                (tgt_box[..., 2] - pcx) / s,
                (tgt_box[..., 3] - pcy) / s,
            ],
            axis=-1,
        )
        t_ltrb = jnp.clip(t_ltrb, 0, reg_max - 1.001)
        tl = jnp.floor(t_ltrb)
        wr = t_ltrb - tl
        logits = bl.reshape(b, h, w, 4, reg_max)
        logp = jax.nn.log_softmax(logits, axis=-1)
        dfl = -(
            jnp.take_along_axis(logp, tl[..., None].astype(jnp.int32), axis=-1)[..., 0] * (1 - wr)
            + jnp.take_along_axis(logp, (tl[..., None] + 1).astype(jnp.int32), axis=-1)[..., 0] * wr
        ).sum(-1)
        total_dfl += jnp.sum(dfl * assigned)
        total_pos += jnp.sum(assigned)

    loss = 0.5 * total_cls / (b * sum(x.shape[1] * x.shape[2] for x in box_logits)) \
        + (7.5 * total_box + 1.5 * total_dfl) / total_pos
    metrics = {"loss": loss, "num_pos": total_pos}
    return loss, (mutated, metrics)


def make_train_step(model: YOLOv8, tx: optax.GradientTransformation):
    def train_step(state: TrainState, images, targets: Targets):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            return yolo_loss(model, variables, images, targets, train=True)

        (loss, (mutated, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(
                params=params,
                batch_stats=mutated.get("batch_stats", state.batch_stats),
                opt_state=opt_state,
                step=state.step + 1,
            ),
            metrics,
        )

    return train_step


def init_train_state(model: YOLOv8, variables, lr: float = 1e-3) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(lr))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    return state, tx
