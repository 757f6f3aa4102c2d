"""Checkpoint / resume utilities.

The reference has no checkpointing (SURVEY.md section 5); here both long-running
surfaces are resumable:
- the mosaic stitcher state (VideMosaic.checkpoint()/restore() — a plain pytree of
  arrays) via numpy .npz snapshots;
- YOLO training state via orbax when available, with an .npz fallback.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def save_pytree_npz(path: str, tree: Any) -> None:
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez_compressed(
        path,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_pytree_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by save_pytree_npz, using `like` for the structure.

    The stored treedef string and per-leaf shapes/dtypes are validated against
    `like` so a checkpoint from a different config cannot silently misassign
    leaves that happen to coincide in count."""
    import jax

    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    if "__treedef__" in data:
        saved_td = bytes(data["__treedef__"]).decode()
        if saved_td != str(treedef):
            raise ValueError(
                f"checkpoint structure mismatch:\n  saved: {saved_td}\n  expected: {str(treedef)}"
            )
    restored = []
    for i, ref in enumerate(leaves):
        leaf = data[f"leaf_{i}"]
        # Validate against metadata only — np.asarray(ref) would force a
        # device->host transfer, and a backend-init failure there (e.g. a
        # wedged TPU tunnel) would poison the load and silently leave the
        # caller on random init weights.
        ref_shape = tuple(getattr(ref, "shape", np.shape(ref)))
        if tuple(leaf.shape) != ref_shape:
            raise ValueError(
                f"checkpoint leaf {i} shape {leaf.shape} != expected {ref_shape}"
            )
        restored.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, restored)


def save_train_state(ckpt_dir: str, state, step: int) -> str:
    """Orbax checkpoint when importable, .npz otherwise."""
    os.makedirs(ckpt_dir, exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
        return path
    except Exception:
        path = os.path.join(ckpt_dir, f"step_{step}.npz")
        save_pytree_npz(path, state)
        return path


def load_train_state(path: str, like):
    if path.endswith(".npz"):
        return load_pytree_npz(path, like)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)
