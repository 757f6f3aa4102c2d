"""Detection-quality cost of config 5's streaming letterbox (VERDICT r4 weak
item 7): the 1080p bench stream runs single-pass detection at (384, 640) — a
~2.8x downsample of the 1920x1080 frame. This eval RECORDS that cost instead
of leaving it implied: synthetic aerial scenes with 1080p geometry (1920-px
square scenes center-cropped to 1080x1920, training-scale absolute object
sizes), scored single-pass at the stream's (384, 640), at a (768, 1280)
half-stride alternative, and optionally with the full multi-pass
detect_objects pipeline (the quality ceiling the mosaic path uses offline).

Reference anchor: the reference detects on full frames with imgsz 1280 + 800px
sliding windows (main.py:149-264) — offline, at ~2-4 fps on 1080p
(README_EN.md:364). The streaming letterbox is the throughput trade.

Usage: [RTVM_PLATFORM=cpu] python tools/eval_1080p_letterbox.py [--n 8] [--multi]
Writes weights/letterbox_1080p_eval.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rtvm_tpu.utils.platform import pin_and_cache  # noqa: E402

pin_and_cache()


def make_1080p_set(n: int, seed: int):
    """1080x1920 frames: 1920-square synth scenes center-cropped in y, with
    ground-truth boxes clipped to the crop (drop boxes cut by >30%)."""
    from rtvm_tpu.models.yolo.synth import BackgroundPool, make_scene

    rng = np.random.RandomState(seed)
    bg = BackgroundPool(1920, rng=rng)
    y0 = (1920 - 1080) // 2
    imgs, gtb, gtc = [], [], []
    for _ in range(n):
        img, b, c = make_scene(rng, bg, 1920, max_objects=24)
        img = img[y0 : y0 + 1080]
        keep_b, keep_c = [], []
        for bb, cc in zip(b, c):
            x1, y1, x2, y2 = bb
            cy1, cy2 = max(y1 - y0, 0.0), min(y2 - y0, 1080.0)
            if cy2 - cy1 >= 0.7 * (y2 - y1) and cy2 > cy1:
                keep_b.append([x1, cy1, x2, cy2])
                keep_c.append(cc)
        imgs.append(img)
        gtb.append(np.asarray(keep_b, np.float32).reshape(-1, 4))
        # ndarray, not list: evaluate_map selects GT rows via `cls == ci`
        gtc.append(np.asarray(keep_c, np.int64))
    return imgs, gtb, gtc


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=515151)
    ap.add_argument("--model", default="yolov8n")
    ap.add_argument("--multi", action="store_true",
                    help="also score the full multi-pass detect_objects (slow)")
    ap.add_argument("--out", default="weights/letterbox_1080p_eval.json")
    a = ap.parse_args(argv)

    from rtvm_tpu.detect.detector import ObjectDetector
    from rtvm_tpu.models.yolo.eval import evaluate_map
    from rtvm_tpu.models.yolo.synth import AERIAL_CLASSES

    imgs, gtb, gtc = make_1080p_set(a.n, a.seed)
    det = ObjectDetector(model=a.model, load_world=False)

    report = {"model": a.model, "ckpt": det.weights_source, "n_scenes": a.n,
              "geometry": "1080x1920", "passes": {}}
    passes = {
        "stream_384x640": dict(imgsz=(384, 640), conf=0.25),
        "stream_768x1280": dict(imgsz=(768, 1280), conf=0.25),
    }
    for name, p in passes.items():
        t0 = time.time()
        dets = []
        for img in imgs:  # one frame per pass: stream semantics, no batching tricks
            dets += det._run_pass(img[None], imgsz=p["imgsz"], conf=p["conf"], iou=0.45)
        rep = evaluate_map(dets, gtb, gtc, AERIAL_CLASSES)
        rep["wall_s"] = round(time.time() - t0, 1)
        report["passes"][name] = rep
        print(name, json.dumps(rep), flush=True)

    if a.multi:
        det_w = ObjectDetector(model=a.model)
        t0 = time.time()
        dets = [det_w.detect_objects(img) for img in imgs]
        dets = [[d for d in dd if d["class"] in AERIAL_CLASSES] for dd in dets]
        rep = evaluate_map(dets, gtb, gtc, AERIAL_CLASSES)
        rep["wall_s"] = round(time.time() - t0, 1)
        report["passes"]["multipass_detect_objects"] = rep
        print("multipass", json.dumps(rep), flush=True)

    with open(a.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v.get("mAP50") for k, v in report["passes"].items()}))


if __name__ == "__main__":
    main()
