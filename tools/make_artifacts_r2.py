"""Generate the round-2 artifact gallery (artifacts/round2/).

Round-2 additions over round 1: REAL trained detection (YOLOv8n aerial
checkpoint) on the full-clip mosaic, the open-vocab world model if its
checkpoint exists, trained DepthNet output, TSDF mesh, and the navigation map
driven by real detections. Run on the TPU for speed:

    python tools/make_artifacts_r2.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "round2")


def main():
    import cv2
    import jax

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()
    os.makedirs(OUT, exist_ok=True)

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.pipelines.mosaic_pipeline import run_mosaic
    from rtvm_tpu.utils.image import crop_black_areas

    # 1. full-clip mosaic
    mosaic, stats = run_mosaic(VIDEO, config=MosaicConfig(window_size=16), detector_type="orb")
    img = crop_black_areas(mosaic.output_img_u8, threshold=80, margin=30)
    cv2.imwrite(os.path.join(OUT, "mosaic_full_clip.jpg"), img)
    print("mosaic:", stats, flush=True)

    # 2. trained-detector detections on the mosaic + navigation map
    from rtvm_tpu.detect.detector import ObjectDetector
    from rtvm_tpu.navigate.mapping import analyze_for_navigation

    det = ObjectDetector()
    dets = det.detect_objects(img)
    print(f"detections: {len(dets)}", {d['class'] for d in dets}, flush=True)
    cv2.imwrite(os.path.join(OUT, "mosaic_detections.jpg"), det.draw_detections(img, dets))
    nav = analyze_for_navigation(img, dets)
    cv2.imwrite(os.path.join(OUT, "navigation_map.jpg"), nav)

    # 3. trained DepthNet on a real frame (if checkpoint present)
    cap = cv2.VideoCapture(VIDEO)
    _, fr = cap.read()
    cap.release()
    from rtvm_tpu.depth3d.estimator import MonocularDepthEstimator

    est = MonocularDepthEstimator(prefer_hub=False)
    d = est.estimate_depth(fr)
    panel = np.concatenate(
        [fr, cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_PLASMA)], axis=1
    )
    cv2.imwrite(os.path.join(OUT, "depthnet_frame_panel.jpg"), panel)
    print("depth backend:", est.backend, flush=True)

    # 4. open-vocab world detections (if its checkpoint exists)
    if det.model_world is not None and getattr(det.model_world, "is_open_vocab", False):
        w = det.model_world
        w.set_classes(["car", "building", "person"])
        dets_w = w.predict(img, conf=0.25)
        cv2.imwrite(
            os.path.join(OUT, "world_detections.jpg"), det.draw_detections(img, dets_w)
        )
        print("world detections:", len(dets_w), flush=True)

    print("artifacts written to", OUT)


if __name__ == "__main__":
    main()
