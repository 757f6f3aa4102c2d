from rtvm_tpu.ops.features import fast, orb  # noqa: F401
