from rtvm_tpu.geometry import homography  # noqa: F401
