"""Mosaic-scale detection eval (round-2 VERDICT item 3).

The reference's main use of multi-pass detection is small objects on LARGE
stitched mosaics (reference main.py:149-264: full-frame imgsz=1280 passes plus
800px sliding windows). This eval measures exactly that regime: synthetic
aerial scenes rendered at >=1280 px with the SAME absolute object sizes as the
320 px training scenes (a 16 px person in a 1280 px scene = the tiny-object
case), scored with the full `ObjectDetector.detect_objects` multi-pass
pipeline — full-frame pass, CLAHE pass, sliding-window tiles, dedup, filters.

Usage:  python tools/eval_mosaic_scale.py [--n 12] [--size 1280] [--no-world]
Writes weights/mosaic_scale_eval.json and prints the mAP report.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--size", type=int, default=1280)
    ap.add_argument("--seed", type=int, default=313131)
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--no-world", action="store_true",
                    help="closed-set detector only (skip the open-vocab head)")
    ap.add_argument("--out", default="weights/mosaic_scale_eval.json")
    a = ap.parse_args(argv)

    import jax

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()

    from rtvm_tpu.detect.detector import ObjectDetector
    from rtvm_tpu.models.yolo.eval import evaluate_map
    from rtvm_tpu.models.yolo.synth import AERIAL_CLASSES, BackgroundPool, make_scene

    rng = np.random.RandomState(a.seed)
    bg = BackgroundPool(a.size, rng=rng)
    imgs, gtb, gtc = [], [], []
    for _ in range(a.n):
        img, b, c = make_scene(rng, bg, a.size, max_objects=24)
        imgs.append(img)
        gtb.append(b)
        gtc.append(c)

    det = ObjectDetector(model=a.model)
    if a.no_world:
        det.model_world = None

    t0 = time.time()
    dets = []
    for i, img in enumerate(imgs):
        d = det.detect_objects(img)
        dets.append(d)
        print(f"scene {i + 1}/{a.n}: {len(d)} detections", flush=True)
    wall = time.time() - t0

    report = evaluate_map(dets, gtb, gtc, AERIAL_CLASSES)
    out = {
        "model": a.model,
        "n_scenes": a.n,
        "size": a.size,
        "world_head": det.model_world is not None,
        "detector_ckpt": det.weights_source,
        "wall_s_per_scene": round(wall / a.n, 2),
        "report": {k: round(v, 4) for k, v in report.items()},
    }
    print(json.dumps(out))
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
