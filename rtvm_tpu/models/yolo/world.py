"""Open-vocabulary detection surface (reference: YOLO-World 'yolov8x-worldv2.pt',
main.py:51-66 with set_classes()).

True open-vocabulary weights are not obtainable in this environment (the reference's
checkpoint was stripped and there is no network egress), so this provides the same
API on top of the standard detector: `set_classes` restricts/renames the output
vocabulary through the canonical-name normalization table, matching how the reference
pipeline consumes YOLO-World results (normalized class names + dedup + filters,
main.py:278-349). When a real open-vocab checkpoint is supplied, the converter in
weights.py and a text-embedding head can be slotted in behind the same interface.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from rtvm_tpu.detect.classes import AERIAL_CLASSES, normalize_class_name


class YoloWorldDetector:
    def __init__(self, base_detector=None, classes: Optional[List[str]] = None):
        if base_detector is None:
            from rtvm_tpu.detect.detector import ObjectDetector

            base_detector = ObjectDetector()
        self.base = base_detector
        self.classes = [normalize_class_name(c) for c in (classes or AERIAL_CLASSES)]

    def set_classes(self, classes: List[str]) -> None:
        """Restrict the detection vocabulary (reference main.py:66)."""
        self.classes = [normalize_class_name(c) for c in classes]

    def predict(self, image: np.ndarray, conf: float = 0.02, imgsz: int = 1280,
                iou: float = 0.5) -> List[dict]:
        dets = self.base._run_pass(np.asarray(image)[None], imgsz=imgsz, conf=conf, iou=iou)[0]
        allowed = set(self.classes)
        return [d for d in dets if d["class"] in allowed]
