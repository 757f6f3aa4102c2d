from rtvm_tpu.mosaic.stitcher import MosaicState, VideMosaic  # noqa: F401
