from rtvm_tpu.utils import image, timing  # noqa: F401
