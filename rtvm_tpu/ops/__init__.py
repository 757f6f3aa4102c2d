from rtvm_tpu.ops import color, filters, match, sampling, warp  # noqa: F401
