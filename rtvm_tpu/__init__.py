"""rtvm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) real-time video-mosaicking and aerial
scene-understanding framework.

Re-designed from scratch with the capabilities of PROcessorI/Real-Time-Video-Mosaic
(see SURVEY.md): streaming mosaic stitching (feature detection -> descriptor matching ->
RANSAC homography -> perspective warp -> distance-weighted blending), YOLO-family object
detection, navigation-map building with host-side A*, visual odometry / SLAM, monocular
depth 3D reconstruction, stereo depth, and a terrain/soil analyzer.

Unlike the reference (a Python app delegating to OpenCV/torch native kernels), the compute
core here is fused JAX/XLA (and Pallas) kernels designed for the TPU's MXU/VPU, with
fixed shapes, batched windows, and `lax.scan` for the sequential stitch chain.
"""

__version__ = "0.1.0"

from rtvm_tpu.config import MosaicConfig, PipelineConfig  # noqa: F401
from rtvm_tpu.mosaic.stitcher import VideMosaic  # noqa: F401


def main(*args, **kwargs):
    """Reference-parity pipeline entry (see rtvm_tpu.pipelines.mosaic_pipeline.main)."""
    from rtvm_tpu.pipelines.mosaic_pipeline import main as _main

    return _main(*args, **kwargs)
