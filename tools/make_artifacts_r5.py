"""Generate the round-5 artifact gallery (artifacts/round5/) — qualitative
evidence tracking this round's claims (VERDICT r4 item 10), regenerated from
the r5 checkpoints and the r5 smoothed blend.

Contents:
  mosaic_sift_full_clip.jpg      full-clip SIFT mosaic, fused chunked path,
                                 31x31-smoothed reference blend (r5)
  mosaic_detections_yolo11n.jpg  serving-default detections on it
  navigation_map.jpg             obstacle masks + A* routes
  mosaic_1080p_fused.jpg         config-5 geometry: 1080p stream prefix on the
                                 fused pre-scanned path
  depthnet_frame_panel.jpg       r5 DepthNet depth on a real frame
  (bench_rehearsal.json, profile jsons land here from their own tools)

Run:  RTVM_PLATFORM=cpu python tools/make_artifacts_r5.py   (or on the TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "round5"
)


def main():
    import cv2

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()
    os.makedirs(OUT, exist_ok=True)

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.pipelines.mosaic_pipeline import run_mosaic
    from rtvm_tpu.utils.image import crop_black_areas

    # 1. full-clip SIFT-path mosaic (fused + decode overlap); resumable
    mosaic_path = os.path.join(OUT, "mosaic_sift_full_clip.jpg")
    if os.path.exists(mosaic_path):
        img = cv2.imread(mosaic_path)
        print("mosaic: reusing existing", mosaic_path, flush=True)
    else:
        mosaic, stats = run_mosaic(
            VIDEO, config=MosaicConfig(window_size=16), detector_type="sift", fused=True
        )
        img = crop_black_areas(mosaic.output_img_u8, threshold=80, margin=30)
        cv2.imwrite(mosaic_path, img)
        print("mosaic:", {k: v for k, v in stats.items() if not hasattr(v, "shape")}, flush=True)

    # 2. serving-default detections (yolo11n) + navigation map
    from rtvm_tpu.detect.detector import ObjectDetector
    from rtvm_tpu.navigate.mapping import analyze_for_navigation

    det_path = os.path.join(OUT, "mosaic_detections_yolo11n.jpg")
    if not os.path.exists(det_path):
        det = ObjectDetector()  # DetectConfig default == yolo11n checkpoint
        dets = det.detect_objects(img)
        print(f"detections: {len(dets)} via {det.weights_source}", flush=True)
        cv2.imwrite(det_path, det.draw_detections(img, dets))
        nav = analyze_for_navigation(img, dets)
        cv2.imwrite(os.path.join(OUT, "navigation_map.jpg"), np.asarray(nav))
        print("navigation map written", flush=True)

    # 3. config-5 geometry: 1080p fused stream prefix
    p1080 = os.path.join(OUT, "mosaic_1080p_fused.jpg")
    if not os.path.exists(p1080):
        import tempfile

        cap = cv2.VideoCapture(VIDEO)
        frames = []
        while len(frames) < 97:
            ok, f = cap.read()
            if not ok:
                break
            frames.append(cv2.resize(f, (1920, 1080), interpolation=cv2.INTER_CUBIC))
        cap.release()
        tmp = os.path.join(tempfile.mkdtemp(), "clip1080.mp4")
        vw = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*"mp4v"), 30, (1920, 1080))
        for f in frames:
            vw.write(f)
        vw.release()
        m, stats = run_mosaic(tmp, config=MosaicConfig(window_size=16, auto_grow=True),
                              detector_type="orb", fused=True)
        cv2.imwrite(p1080, crop_black_areas(m.output_img_u8, threshold=80, margin=30))
        print("1080p fused:", {k: v for k, v in stats.items() if not hasattr(v, "shape")},
              flush=True)

    # 4. DepthNet panel on a real frame
    cap = cv2.VideoCapture(VIDEO)
    _, frame = cap.read()
    cap.release()
    from rtvm_tpu.depth3d.estimator import MonocularDepthEstimator

    est = MonocularDepthEstimator()
    depth = np.asarray(est.estimate_depth(frame))
    d8 = cv2.applyColorMap(
        (255 * (depth - depth.min()) / max(float(np.ptp(depth)), 1e-6)).astype(np.uint8),
        cv2.COLORMAP_PLASMA,
    )
    panel = np.concatenate([frame, cv2.resize(d8, (frame.shape[1], frame.shape[0]))], axis=1)
    cv2.imwrite(os.path.join(OUT, "depthnet_frame_panel.jpg"), panel)
    print("depth panel written (backend:", est.backend, ")", flush=True)


if __name__ == "__main__":
    main()
