"""Checkpoint/resume tests for stitcher state and YOLO train state."""

import jax.numpy as jnp
import numpy as np

from rtvm_tpu.utils.checkpoint import load_pytree_npz, save_pytree_npz


def test_pytree_npz_roundtrip(tmp_path):
    tree = {"a": jnp.arange(5), "b": {"c": jnp.ones((3, 2)), "d": jnp.int32(7)}}
    p = str(tmp_path / "state.npz")
    save_pytree_npz(p, tree)
    restored = load_pytree_npz(p, tree)
    assert (np.asarray(restored["a"]) == np.arange(5)).all()
    assert restored["b"]["d"] == 7


def test_train_state_checkpoint(tmp_path):
    from rtvm_tpu.models.yolo.model import build_yolo
    from rtvm_tpu.models.yolo.train import init_train_state
    from rtvm_tpu.utils.checkpoint import load_train_state, save_train_state

    model, variables = build_yolo("yolov8n", num_classes=4, imgsz=32)
    state, _ = init_train_state(model, variables)
    path = save_train_state(str(tmp_path / "ckpt"), state, step=0)
    restored = load_train_state(path, state)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        assert np.allclose(np.asarray(a), np.asarray(b))
