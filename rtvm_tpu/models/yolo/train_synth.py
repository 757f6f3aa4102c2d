"""Train YOLOv8 on synthetic aerial scenes (synth.py) so detection runs with
real signal instead of the stripped reference checkpoints (reference
main.py:44-66; .MISSING_LARGE_BLOBS + no egress in this environment).

Usage:
    python -m rtvm_tpu.models.yolo.train_synth --steps 3000 --batch 16

Writes weights/<model>_aerial.npz (+ eval report) that ObjectDetector picks up
automatically. mAP@0.5 on a held-out synthetic set gates success (target 0.5).
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import numpy as np

from rtvm_tpu.models.yolo.synth import AERIAL_CLASSES, BackgroundPool, make_batch, make_scene


def _bgr_to_rgb01(imgs_u8):
    import jax.numpy as jnp

    return imgs_u8[..., ::-1].astype(jnp.float32) / 255.0


def predict_scenes(model, variables, images_u8: np.ndarray, conf=0.25, iou=0.45, bf16=True):
    """Batched inference on square scenes (size == train imgsz). Returns
    per-image detection dicts like ObjectDetector._run_pass."""
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.models.yolo import postprocess as pp

    if bf16:
        variables = jax.tree_util.tree_map(
            lambda v: v.astype(jnp.bfloat16) if hasattr(v, "astype") else v, variables
        )

    @jax.jit
    def run(frames_u8):
        x = _bgr_to_rgb01(frames_u8)
        if bf16:
            x = x.astype(jnp.bfloat16)
        box_l, cls_l = model.apply(variables, x, train=False)
        box_l = [b.astype(jnp.float32) for b in box_l]
        cls_l = [c.astype(jnp.float32) for c in cls_l]
        boxes, scores = pp.decode_predictions(box_l, cls_l, model.cfg.strides, model.cfg.reg_max)
        return jax.vmap(lambda bx, sc: pp.nms_fixed(bx, sc, conf, iou))(boxes, scores)

    det = run(jnp.asarray(images_u8))
    boxes, scores = np.asarray(det.boxes), np.asarray(det.scores)
    cls, valid = np.asarray(det.classes), np.asarray(det.valid)
    out: List[List[dict]] = []
    for b in range(len(images_u8)):
        out.append(
            [
                {
                    "bbox": [float(v) for v in boxes[b, i]],
                    "class": AERIAL_CLASSES[int(cls[b, i])],
                    "confidence": float(scores[b, i]),
                }
                for i in np.flatnonzero(valid[b])
            ]
        )
    return out


def make_eval_set(n: int = 64, size: int = 320, seed: int = 9999):
    rng = np.random.RandomState(seed)
    bg = BackgroundPool(size, rng=rng)
    imgs, gtb, gtc = [], [], []
    for _ in range(n):
        img, b, c = make_scene(rng, bg, size)
        imgs.append(img)
        gtb.append(b)
        gtc.append(c)
    return np.stack(imgs), gtb, gtc


def evaluate(model, variables, n: int = 64, size: int = 320, conf: float = 0.25):
    from rtvm_tpu.models.yolo.eval import evaluate_map

    imgs, gtb, gtc = make_eval_set(n, size)
    dets = []
    for i in range(0, len(imgs), 16):
        dets += predict_scenes(model, variables, imgs[i : i + 16], conf=conf)
    return evaluate_map(dets, gtb, gtc, AERIAL_CLASSES)


def train(
    model_name: str = "yolov8n",
    steps: int = 3000,
    batch: int = 16,
    imgsz: int = 320,
    lr: float = 2e-3,
    seed: int = 0,
    eval_every: int = 1000,
    out_dir: str = "weights",
    log_every: int = 50,
    resume: Optional[str] = None,
):
    import jax
    import jax.numpy as jnp
    import optax

    from rtvm_tpu.models.yolo.model import build_yolo
    from rtvm_tpu.models.yolo.train import Targets, TrainState, init_train_state, make_train_step
    from rtvm_tpu.utils.checkpoint import load_pytree_npz, save_pytree_npz

    model, variables = build_yolo(model_name, num_classes=len(AERIAL_CLASSES), imgsz=imgsz, seed=seed)

    sched = optax.warmup_cosine_decay_schedule(0.0, lr, min(500, steps // 4), steps, lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(10.0), optax.adamw(sched, weight_decay=5e-4))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.int32(0),
    )
    if resume:
        state = load_pytree_npz(resume, state)
        print(f"resumed from {resume} at step {int(state.step)}")
    raw_step = make_train_step(model, tx)

    @jax.jit
    def step_fn(st, imgs_u8, boxes, cls, valid):
        images = _bgr_to_rgb01(imgs_u8)
        return raw_step(st, images, Targets(boxes=boxes, classes=cls, valid=valid))

    rng = np.random.RandomState(seed + 1)
    bg = BackgroundPool(imgsz, rng=rng)
    print(f"backgrounds: {len(bg.frames)} clip frames "
          f"({'procedural only' if not bg.frames else 'drone clips'})")

    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    losses = []
    for it in range(int(state.step), steps):
        imgs, boxes, cls, valid = make_batch(rng, bg, batch, imgsz)
        state, metrics = step_fn(
            state, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(cls), jnp.asarray(valid)
        )
        if (it + 1) % log_every == 0:
            loss = float(metrics["loss"])
            losses.append(loss)
            dt = time.time() - t0
            print(f"step {it + 1}/{steps} loss {loss:.3f} ({dt:.0f}s, {(it + 1) / dt:.1f} it/s)", flush=True)
        if (it + 1) % eval_every == 0 or it + 1 == steps:
            variables = {"params": state.params, "batch_stats": state.batch_stats}
            report = evaluate(model, variables, n=48, size=imgsz)
            print(f"step {it + 1} eval: {json.dumps(report)}", flush=True)
            path = os.path.join(out_dir, f"{model_name}_aerial.npz")
            save_pytree_npz(path, {"params": state.params, "batch_stats": state.batch_stats})
            with open(os.path.join(out_dir, f"{model_name}_aerial.json"), "w") as f:
                json.dump({"classes": AERIAL_CLASSES, "imgsz": imgsz, "step": it + 1,
                           "eval": report}, f)
            save_pytree_npz(os.path.join(out_dir, f"{model_name}_aerial_trainstate.npz"), state)
    return state, model


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train YOLOv8 on synthetic aerial scenes")
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    train(a.model, a.steps, a.batch, a.imgsz, a.lr, a.seed, a.eval_every, a.out_dir, resume=a.resume)


if __name__ == "__main__":
    main()
