"""Batch images-directory pipeline (reference main.py:1514-1573: per-image detection
+ navigation map, saved to Detections/)."""

from __future__ import annotations

import glob
import os


def process_images_dir(images_dir: str, output_dir: str, config) -> list:
    import cv2

    det_dir = os.path.join(output_dir, "Detections")
    os.makedirs(det_dir, exist_ok=True)
    paths = sorted(
        glob.glob(os.path.join(images_dir, "*.jpg"))
        + glob.glob(os.path.join(images_dir, "*.png"))
        + glob.glob(os.path.join(images_dir, "*.jpeg"))
    )
    results = []
    detector = None
    for p in paths:
        img = cv2.imread(p)
        if img is None:
            continue
        name = os.path.splitext(os.path.basename(p))[0]
        detections = []
        try:
            if detector is None:
                from rtvm_tpu.detect.detector import ObjectDetector

                detector = ObjectDetector(model=config.detect.model)
            detections = detector.detect_objects(img)
            vis = detector.draw_detections(img, detections)
            cv2.imwrite(os.path.join(det_dir, f"{name}_detected.jpg"), vis)
        except Exception as e:
            print(f"Предупреждение: детекция недоступна для {name}: {e}")
        try:
            from rtvm_tpu.navigate.mapping import analyze_for_navigation

            nav = analyze_for_navigation(img, detections)
            cv2.imwrite(os.path.join(det_dir, f"{name}_navigation.jpg"), nav)
        except Exception as e:
            print(f"Предупреждение: карта навигации недоступна для {name}: {e}")
        results.append({"image": p, "detections": detections})
        print(f"Обработано изображение {name}: {len(detections)} объектов")
    return results
