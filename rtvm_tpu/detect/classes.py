"""Class vocabularies + open-vocabulary name normalization.

Behavioral port of the reference's canonicalization table (_normalize_class_name,
reference main.py:351-411): open-vocab detector outputs are folded into a compact set
of canonical aerial classes, with 'building' absorbing the many structure synonyms.
"""

from __future__ import annotations

# COCO-80 names (order matters: class indices from standard YOLO checkpoints).
COCO_CLASSES = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck",
    "boat", "traffic light", "fire hydrant", "stop sign", "parking meter", "bench",
    "bird", "cat", "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra",
    "giraffe", "backpack", "umbrella", "handbag", "tie", "suitcase", "frisbee",
    "skis", "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "wine glass", "cup",
    "fork", "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair", "couch",
    "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

# Aerial open-vocabulary detection classes (reference main.py:53-64).
AERIAL_CLASSES = [
    "car", "truck", "bus", "van", "person", "dog", "cat",
    "building", "house", "roof", "shed", "barn", "garage",
    "greenhouse", "warehouse", "pool", "boat",
]

_BUILDING_SYNONYMS = {
    "house", "roof", "rooftop", "shed", "barn", "garage", "greenhouse", "warehouse",
    "cabin", "hut", "cottage", "structure", "home", "residence", "apartment",
    "construction", "facility", "factory", "hangar", "storage", "silo", "tower",
    "chapel", "church", "station", "terminal", "pavilion", "kiosk", "booth",
}
_VEHICLE_MAP = {
    "van": "truck", "pickup": "truck", "pickup truck": "truck", "lorry": "truck",
    "suv": "car", "sedan": "car", "automobile": "car", "vehicle": "car",
    "minibus": "bus", "motorbike": "motorcycle",
}
_CANONICAL = {
    "person", "car", "truck", "bus", "motorcycle", "bicycle", "boat", "dog", "cat",
    "building", "fire", "smoke", "pool", "tent", "solar_panel", "bird", "horse",
    "sheep", "cow",
}


def normalize_class_name(name: str) -> str:
    """Canonicalize an open-vocabulary class name (reference main.py:351-411)."""
    n = name.strip().lower().replace("-", " ")
    if n in _CANONICAL:
        return n
    if n in _BUILDING_SYNONYMS:
        return "building"
    if n in _VEHICLE_MAP:
        return _VEHICLE_MAP[n]
    if "fire" in n or "flame" in n:
        return "fire"
    if "smoke" in n:
        return "smoke"
    if "pool" in n or "swimming" in n:
        return "pool"
    if "solar" in n:
        return "solar_panel"
    if "tent" in n:
        return "tent"
    if any(k in n for k in ("build", "roof", "house")):
        return "building"
    return n.replace(" ", "_")


# Obstacle class groups used by the navigation map builder (reference main.py:1068-1130).
OBSTACLE_GROUPS = {
    "danger": {"fire", "smoke"},  # 40 px buffer, weight 1.0
    "vehicle": {"car", "truck", "bus", "motorcycle", "bicycle", "boat"},  # 25 px, 0.9
    "living": {"person", "dog", "cat", "horse", "sheep", "cow", "bird"},  # 20 px, 0.85
    "static": {"building", "pool", "tent", "solar_panel"},  # 15 px, 0.7
}
