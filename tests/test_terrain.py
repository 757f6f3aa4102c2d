"""Terrain/soil analyzer tests on synthetic soil-colored images."""

import cv2
import numpy as np
import pytest

from rtvm_tpu.slam.terrain import SOIL_TYPES, TerrainSoilAnalyzer


def _soil_image(bgr, noise=8, size=(200, 260)):
    rng = np.random.RandomState(0)
    img = np.full(size + (3,), bgr, np.float32)
    img += rng.randn(*size, 3) * noise
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def analyzer():
    return TerrainSoilAnalyzer()


def test_dark_soil_classified_fertile(analyzer):
    # very dark brown -> chernozem or peat, both high fertility
    res = analyzer.analyze_image(_soil_image((20, 30, 45)))
    assert res["soil_type"] in ("чернозём", "торф")
    assert res["properties"]["fertility"].endswith("высокая")


def test_bright_sand_classified(analyzer):
    res = analyzer.analyze_image(_soil_image((150, 175, 195)))
    assert res["soil_type"] in ("песок", "супесь", "солончак", "каменистая почва")


def test_vegetation_cover_detected(analyzer):
    img = _soil_image((40, 60, 90))
    img[:, :130] = (40, 160, 50)  # half the frame green vegetation
    res = analyzer.analyze_image(img)
    assert res["vegetation_cover"] > 0.3
    assert res["vegetation_class"] in ("умеренная", "густая")


def test_moisture_increases_with_darkness(analyzer):
    dry = analyzer.analyze_image(_soil_image((110, 150, 180)))
    wet = analyzer.analyze_image(_soil_image((25, 35, 50)))
    assert wet["moisture"] > dry["moisture"]


def test_report_and_visualization(analyzer):
    img = _soil_image((60, 90, 120))
    res = analyzer.analyze_image(img)
    rep = analyzer.report(res)
    assert "ОТЧЁТ" in rep and res["soil_type"] in rep
    vis = analyzer.visualize(img, res)
    assert vis.shape[1] > img.shape[1]
    assert len(res["recommendations"]) >= 1


def test_all_soil_types_have_properties():
    for name, p in SOIL_TYPES.items():
        assert {"fertility", "ph", "crops"} <= set(p)
