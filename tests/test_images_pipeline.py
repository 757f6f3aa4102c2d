"""Images-directory batch driver test (reference main.py:1514-1573 parity) with a
stubbed detector so it runs fast on CPU."""

import os

import cv2
import numpy as np


class _FakeDetector:
    def detect_objects(self, img):
        return [{"bbox": [10, 10, 60, 50], "class": "building", "confidence": 0.8}]

    @staticmethod
    def draw_detections(img, dets):
        out = img.copy()
        for d in dets:
            x1, y1, x2, y2 = [int(v) for v in d["bbox"]]
            cv2.rectangle(out, (x1, y1), (x2, y2), (0, 255, 0), 2)
        return out


def test_process_images_dir(tmp_path, textured_image, monkeypatch):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(3):
        cv2.imwrite(str(imgs / f"shot{i}.jpg"), textured_image[:160, :220])

    import rtvm_tpu.detect.detector as det_mod

    monkeypatch.setattr(det_mod, "ObjectDetector", lambda **kw: _FakeDetector())

    from rtvm_tpu.config import PipelineConfig
    from rtvm_tpu.pipelines.images_pipeline import process_images_dir

    out = tmp_path / "out"
    results = process_images_dir(str(imgs), str(out), PipelineConfig())
    assert len(results) == 3
    det_dir = out / "Detections"
    names = sorted(os.listdir(det_dir))
    assert "shot0_detected.jpg" in names
    assert "shot0_navigation.jpg" in names
    assert len(names) == 6  # detected + navigation per image
