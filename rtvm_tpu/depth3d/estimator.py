"""Monocular depth estimation with a model registry and layered fallbacks.

Capability port of reference MonocularDepthEstimator (depth_to_3d.py:65-222): a
registry of hub model ids, per-video frame sampling, and normalized depth output.
This environment has no network egress, so the resolution order is:
  1. a HuggingFace depth model if its weights are already cached locally;
  2. this framework's own lightweight Flax depth net (encoder-decoder, random init
     unless a checkpoint is supplied) — keeps the full 3D pipeline runnable;
  3. a luminance/gradient heuristic (documented, deterministic) as the last resort.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Registry mirroring the reference's model menu (depth_to_3d.py:81-93).
MODEL_REGISTRY = {
    "glpn": "vinvino02/glpn-nyu",
    "dpt-large": "Intel/dpt-large",
    "midas": "Intel/dpt-hybrid-midas",
    "depth-anything-base": "LiheYoung/depth-anything-base-hf",
    "depth-anything-small": "LiheYoung/depth-anything-small-hf",
    "depth-anything-v2-base": "depth-anything/Depth-Anything-V2-Base-hf",
    "depth-anything-v2-large": "depth-anything/Depth-Anything-V2-Large-hf",
    "zoedepth": "Intel/zoedepth-nyu-kitti",
    "depthpro": "apple/DepthPro-hf",
}


class MonocularDepthEstimator:
    def __init__(self, model: str = "depth-anything-small", prefer_hub: bool = True):
        self.model_name = model
        self.backend = "heuristic"
        self._pipe = None
        self._flax = None
        if prefer_hub:
            try:
                # fail fast when offline: transformers otherwise burns ~1 min
                # in connect retries before falling back
                import socket

                socket.create_connection(("huggingface.co", 443), timeout=3).close()
                from transformers import pipeline

                self._pipe = pipeline(
                    "depth-estimation", model=MODEL_REGISTRY.get(model, model),
                    device=-1,
                )
                self.backend = "hub"
            except Exception as e:
                print(f"Предупреждение: HF модель глубины недоступна ({e}); "
                      f"используется собственная сеть")
        if self._pipe is None:
            try:
                from rtvm_tpu.models.depthnet import build_depthnet

                model, variables = build_depthnet()
                # trained synthetic-terrain checkpoint (models/train_depth.py)
                ckpt = self._find_depth_weights()
                if ckpt is not None:
                    from rtvm_tpu.utils.checkpoint import load_pytree_npz

                    variables = load_pytree_npz(ckpt, dict(variables))
                    print(f"Загружены веса глубины: {ckpt}")
                self._flax = (model, variables)
                self.backend = "flax"
            except Exception as e:
                print(f"Предупреждение: Flax depth net недоступна ({e}); эвристика")

    @staticmethod
    def _find_depth_weights():
        import os

        repo_weights = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "weights"
        )
        for d in (".", "weights", repo_weights):
            p = os.path.join(d, "depthnet.npz")
            if os.path.exists(p):
                return p
        return None

    def estimate_depth(self, image_bgr: np.ndarray) -> np.ndarray:
        """[H, W, 3] BGR uint8 -> [H, W] float32 normalized depth in [0, 1]
        (1 = near, matching the reference's normalized convention)."""
        h, w = image_bgr.shape[:2]
        if self.backend == "hub":
            from PIL import Image

            pil = Image.fromarray(image_bgr[..., ::-1])
            d = np.asarray(self._pipe(pil)["depth"], np.float32)
            if d.shape != (h, w):
                import cv2

                d = cv2.resize(d, (w, h), interpolation=cv2.INTER_CUBIC)
        elif self.backend == "flax":
            model, variables = self._flax
            x = jnp.asarray(image_bgr[None, ..., ::-1], jnp.float32) / 255.0
            d = np.asarray(model.apply(variables, x)[0, ..., 0])
        else:
            d = self._heuristic_depth(image_bgr)
        d = d - d.min()
        return (d / max(d.max(), 1e-6)).astype(np.float32)

    @staticmethod
    def _heuristic_depth(image_bgr: np.ndarray) -> np.ndarray:
        """Deterministic proxy: brightness + vertical position prior + local detail
        (textured/bright/lower regions read as closer). Not a learned estimate."""
        from rtvm_tpu.ops import color, filters

        g = color.bgr2gray(jnp.asarray(image_bgr)) / 255.0
        detail = filters.box_blur(jnp.abs(g - filters.gaussian_blur(g, 3.0)), 15)
        hgt = jnp.linspace(0.0, 1.0, image_bgr.shape[0])[:, None]
        d = 0.45 * g + 0.35 * jnp.broadcast_to(hgt, g.shape) + 0.2 * detail / jnp.maximum(detail.max(), 1e-6)
        return np.asarray(filters.gaussian_blur(d, 2.0))

    def estimate_depth_video(
        self, video_path: str, frame_step: int = 30, max_frames: int = 10
    ):
        """Sample every frame_step-th frame (reference depth_to_3d.py:178-222).
        Yields (frame_bgr, depth)."""
        import cv2

        cap = cv2.VideoCapture(video_path)
        idx = 0
        taken = 0
        while taken < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            if idx % frame_step == 0:
                yield frame, self.estimate_depth(frame)
                taken += 1
            idx += 1
        cap.release()
