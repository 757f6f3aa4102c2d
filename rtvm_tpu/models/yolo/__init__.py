from rtvm_tpu.models.yolo.model import YOLOv8, build_yolo  # noqa: F401
