"""Open-vocabulary GENERALIZATION eval (VERDICT r4 item 9): score the trained
YOLOWorld checkpoint on held-out prompts the trainer never tokenized
(train_world.UNSEEN_PROMPTS), alongside the canonical prompts for contrast.

This probes the reference's set_classes() semantics (main.py:51-66) where it
matters: arbitrary user vocabulary, not the training synonym set.

Usage:
    [RTVM_PLATFORM=cpu] python tools/eval_world_unseen.py [--variant yolov8n] [--n 48]
Writes weights/<variant>_world_unseen.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtvm_tpu.utils.platform import pin_and_cache  # noqa: E402

pin_and_cache()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="yolov8n")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--out-dir", default="weights")
    a = ap.parse_args(argv)

    from rtvm_tpu.models.yolo.synth import AERIAL_CLASSES
    from rtvm_tpu.models.yolo.train_world import UNSEEN_PROMPTS, evaluate
    from rtvm_tpu.models.yolo.world import build_yolo_world
    from rtvm_tpu.utils.checkpoint import load_pytree_npz

    path = os.path.join(a.out_dir, f"{a.variant}_world.npz")
    model, init_vars = build_yolo_world(a.variant)
    variables = load_pytree_npz(
        path,
        {"params": init_vars["params"], "batch_stats": init_vars.get("batch_stats", {})},
    )

    unseen = [UNSEEN_PROMPTS[c] for c in AERIAL_CLASSES]
    rep_unseen = evaluate(model, variables, n=a.n, prompts=unseen)
    rep_seen = evaluate(model, variables, n=a.n)
    out = {
        "variant": a.variant,
        "checkpoint": path,
        "n_scenes": a.n,
        "unseen_prompts": dict(zip(AERIAL_CLASSES, unseen)),
        "unseen": rep_unseen,
        "canonical": rep_seen,
    }
    os.makedirs(a.out_dir, exist_ok=True)
    with open(os.path.join(a.out_dir, f"{a.variant}_world_unseen.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
