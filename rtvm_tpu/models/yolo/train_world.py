"""Train the open-vocabulary YOLOWorld on synthetic aerial scenes.

Joint training of trunk + region-embedding head + trigram text encoder
(world.py). Prompts are sampled per step from per-class synonym lists so the
text encoder learns a neighborhood, not a lookup table — this is what makes
set_classes with unseen-but-related phrasings behave sensibly.

Usage:
    python -m rtvm_tpu.models.yolo.train_world --steps 4000 --batch 16
Writes weights/<variant>_world.npz which YoloWorldDetector picks up.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List

import numpy as np

from rtvm_tpu.models.yolo.synth import AERIAL_CLASSES, BackgroundPool, make_batch

# Prompt variants per training class (sampled per step).
SYNONYMS = {
    "person": ["person", "people", "pedestrian", "human"],
    "car": ["car", "cars", "automobile", "vehicle"],
    "truck": ["truck", "lorry", "trucks"],
    "bus": ["bus", "buses", "minibus"],
    "building": ["building", "house", "roof", "buildings"],
    "boat": ["boat", "ship", "vessel"],
    "tent": ["tent", "tents", "canopy"],
    "pool": ["pool", "swimming pool", "pond"],
}

# HELD-OUT prompts for the open-vocab generalization eval (VERDICT r4 item 9):
# strings the trainer NEVER tokenizes (not in SYNONYMS), lexically related the
# way real set_classes() vocabulary is (reference main.py:51-66) — the trigram
# text tower's claimed mechanism. Do not add these to SYNONYMS: that would
# turn the unseen eval into a seen one.
UNSEEN_PROMPTS = {
    "person": "pedestrians",
    "car": "vehicles",
    "truck": "lorries",
    "bus": "school bus",
    "building": "rooftop",
    "boat": "ships",
    "tent": "canopies",
    "pool": "water pool",
}
assert all(UNSEEN_PROMPTS[c] not in SYNONYMS[c] for c in UNSEEN_PROMPTS)


class _WorldAdapter:
    """Presents YOLOWorld as the (cfg, apply) surface yolo_loss expects, with the
    prompt tokens bound per step."""

    def __init__(self, model, ids, mask):
        self.model = model
        self.cfg = model.cfg
        self.ids = ids
        self.mask = mask

    def apply(self, variables, x, train=False, mutable=()):
        return self.model.apply(
            variables, x, self.ids, self.mask, train=train, mutable=mutable
        )


def train(
    variant: str = "yolov8n",
    steps: int = 4000,
    batch: int = 16,
    imgsz: int = 320,
    lr: float = 2e-3,
    seed: int = 0,
    eval_every: int = 1000,
    out_dir: str = "weights",
    log_every: int = 50,
    resume: str | None = None,
):
    import jax
    import jax.numpy as jnp
    import optax

    from rtvm_tpu.models.yolo.train import Targets, TrainState, yolo_loss
    from rtvm_tpu.models.yolo.world import build_yolo_world, tokenize_names
    from rtvm_tpu.utils.checkpoint import load_pytree_npz, save_pytree_npz

    model, variables = build_yolo_world(variant, imgsz=imgsz, seed=seed)

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

    nc = len(AERIAL_CLASSES)

    @jax.jit
    def step_fn(st, imgs_u8, boxes, cls, valid, ids, mask):
        images = imgs_u8[..., ::-1].astype(jnp.float32) / 255.0
        adapter = _WorldAdapter(model, ids, mask)

        def loss_fn(params):
            vs = {"params": params, "batch_stats": st.batch_stats}
            return yolo_loss(adapter, vs, images, Targets(boxes, cls, valid), train=True)

        (loss, (mutated, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return (
            TrainState(params, mutated.get("batch_stats", st.batch_stats), opt_state, st.step + 1),
            metrics,
        )

    rng = np.random.RandomState(seed + 1)
    bg = BackgroundPool(imgsz, rng=rng)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    for it in range(int(state.step), steps):
        imgs, boxes, cls, valid = make_batch(rng, bg, batch, imgsz)
        prompts = [SYNONYMS[c][rng.randint(len(SYNONYMS[c]))] for c in AERIAL_CLASSES]
        ids, mask = tokenize_names(prompts)
        state, metrics = step_fn(
            state, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(cls),
            jnp.asarray(valid), jnp.asarray(ids), jnp.asarray(mask),
        )
        if (it + 1) % log_every == 0:
            dt = time.time() - t0
            print(f"step {it + 1}/{steps} loss {float(metrics['loss']):.3f} "
                  f"({dt:.0f}s, {(it + 1) / dt:.1f} it/s)", flush=True)
        if (it + 1) % eval_every == 0 or it + 1 == steps:
            report = evaluate(model, {"params": state.params, "batch_stats": state.batch_stats},
                              imgsz=imgsz)
            print(f"step {it + 1} eval: {json.dumps(report)}", flush=True)
            save_pytree_npz(os.path.join(out_dir, f"{variant}_world.npz"),
                            {"params": state.params, "batch_stats": state.batch_stats})
            with open(os.path.join(out_dir, f"{variant}_world.json"), "w") as f:
                json.dump({"classes": AERIAL_CLASSES, "imgsz": imgsz, "step": it + 1,
                           "eval": report}, f)
            save_pytree_npz(os.path.join(out_dir, f"{variant}_world_trainstate.npz"), state)
    return state, model


def evaluate(model, variables, n: int = 48, imgsz: int = 320, conf: float = 0.25,
             prompts: List[str] | None = None):
    """mAP@0.5 on held-out synthetic scenes. `prompts` (parallel to
    AERIAL_CLASSES) defaults to the canonical class names; pass
    [UNSEEN_PROMPTS[c] for c in AERIAL_CLASSES] for the unseen-vocabulary
    generalization eval — only the text-tower inputs change, the class-i
    prompt still scores class-i regions."""
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.models.yolo import postprocess as pp
    from rtvm_tpu.models.yolo.eval import evaluate_map
    from rtvm_tpu.models.yolo.train_synth import make_eval_set
    from rtvm_tpu.models.yolo.world import tokenize_names

    imgs, gtb, gtc = make_eval_set(n, imgsz)
    ids, mask = tokenize_names(list(prompts) if prompts is not None else AERIAL_CLASSES)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)

    @jax.jit
    def run(frames_u8):
        x = frames_u8[..., ::-1].astype(jnp.float32) / 255.0
        box_l, cls_l = model.apply(variables, x, ids, mask, train=False)
        boxes, scores = pp.decode_predictions(box_l, cls_l, model.cfg.strides, model.cfg.reg_max)
        return jax.vmap(lambda bx, sc: pp.nms_fixed(bx, sc, conf, 0.45))(boxes, scores)

    dets: List[List[dict]] = []
    for i in range(0, len(imgs), 16):
        det = run(jnp.asarray(imgs[i : i + 16]))
        boxes, scores = np.asarray(det.boxes), np.asarray(det.scores)
        cls, valid = np.asarray(det.classes), np.asarray(det.valid)
        for b in range(len(boxes)):
            dets.append([
                {"bbox": [float(v) for v in boxes[b, j]],
                 "class": AERIAL_CLASSES[int(cls[b, j])],
                 "confidence": float(scores[b, j])}
                for j in np.flatnonzero(valid[b])
            ])
    return evaluate_map(dets, gtb, gtc, AERIAL_CLASSES)


def main(argv=None):
    ap = argparse.ArgumentParser(description="Train open-vocab YOLOWorld on synthetic aerial scenes")
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--imgsz", type=int, default=320)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--eval-every", type=int, default=1000)
    ap.add_argument("--out-dir", default="weights")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args(argv)
    train(a.variant, a.steps, a.batch, a.imgsz, a.lr, a.seed, a.eval_every, a.out_dir,
          resume=a.resume)


if __name__ == "__main__":
    main()
