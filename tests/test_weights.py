"""Round-trip test of the ultralytics->flax weight converter against a synthetic
state dict laid out exactly like a torch checkpoint: per-module interleaved
conv/bn tensors (conv.weight, bn.weight, bn.bias, bn.running_mean,
bn.running_var, bn.num_batches_tracked) in ultralytics declaration order
(C2f declares cv1, cv2, then m.*). Every leaf gets a distinct value so any
pairing slip — gamma/beta swap, mean/var landing on scale/bias, off-by-one conv
— fails the equality check."""

import numpy as np
import pytest

from rtvm_tpu.models.yolo.model import build_yolo
from rtvm_tpu.models.yolo.weights import convert_to_flax, ult_key_to_flax


def _conv_keys(prefix):
    return [
        f"{prefix}.conv.weight",
        f"{prefix}.bn.weight",
        f"{prefix}.bn.bias",
        f"{prefix}.bn.running_mean",
        f"{prefix}.bn.running_var",
        f"{prefix}.bn.num_batches_tracked",
    ]


def _c2f_keys(prefix, n):
    ks = _conv_keys(f"{prefix}.cv1") + _conv_keys(f"{prefix}.cv2")
    for i in range(n):
        ks += _conv_keys(f"{prefix}.m.{i}.cv1") + _conv_keys(f"{prefix}.m.{i}.cv2")
    return ks


def _v8n_state_keys():
    """All state-dict keys of an ultralytics yolov8n DetectionModel, in its
    declaration order (depth multiple 1/3: C2f n = 1,2,2,1 backbone, 1 neck)."""
    ks = []
    ks += _conv_keys("model.0") + _conv_keys("model.1")
    ks += _c2f_keys("model.2", 1)
    ks += _conv_keys("model.3") + _c2f_keys("model.4", 2)
    ks += _conv_keys("model.5") + _c2f_keys("model.6", 2)
    ks += _conv_keys("model.7") + _c2f_keys("model.8", 1)
    ks += _conv_keys("model.9.cv1") + _conv_keys("model.9.cv2")  # SPPF
    ks += _c2f_keys("model.12", 1) + _c2f_keys("model.15", 1)
    ks += _conv_keys("model.16") + _c2f_keys("model.18", 1)
    ks += _conv_keys("model.19") + _c2f_keys("model.21", 1)
    for branch in ("cv2", "cv3"):
        for s in range(3):
            ks += _conv_keys(f"model.22.{branch}.{s}.0")
            ks += _conv_keys(f"model.22.{branch}.{s}.1")
            ks += [f"model.22.{branch}.{s}.2.weight", f"model.22.{branch}.{s}.2.bias"]
    ks.append("model.22.dfl.conv.weight")
    return ks


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return np.asarray(node)


@pytest.fixture(scope="module")
def model_vars():
    _, variables = build_yolo("yolov8n", num_classes=80, imgsz=64, seed=0)
    return variables


def test_roundtrip_exact(model_vars):
    import jax

    # distinct value per leaf so misassignment cannot cancel out
    counter = [0]

    def fill(x):
        counter[0] += 1
        return np.full(np.asarray(x).shape, float(counter[0]), np.float32) + (
            np.arange(np.asarray(x).size, dtype=np.float32).reshape(np.asarray(x).shape)
            / max(np.asarray(x).size, 1)
        )

    target = jax.tree_util.tree_map(fill, jax.tree_util.tree_map(np.asarray, dict(model_vars)))

    # Build the torch-style state dict by inverse mapping from the target tree.
    state = {}
    for key in _v8n_state_keys():
        m = ult_key_to_flax(key)
        if m is None:
            state[key] = (
                np.zeros((), np.int64)
                if key.endswith("num_batches_tracked")
                else np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)  # dfl
            )
            continue
        coll, path, transpose = m
        v = _get(target[coll], path)
        state[key] = np.transpose(v, (3, 2, 0, 1)) if transpose else v

    converted = convert_to_flax(state, model_vars)

    flat_t, _ = jax.tree_util.tree_flatten(target)
    flat_c, _ = jax.tree_util.tree_flatten(converted)
    assert len(flat_t) == len(flat_c)
    for a, b in zip(flat_t, flat_c):
        np.testing.assert_array_equal(a, b)


def _c3k2_keys(prefix, n, c3k):
    ks = _conv_keys(f"{prefix}.cv1") + _conv_keys(f"{prefix}.cv2")
    for i in range(n):
        if c3k:
            ks += (
                _conv_keys(f"{prefix}.m.{i}.cv1")
                + _conv_keys(f"{prefix}.m.{i}.cv2")
                + _conv_keys(f"{prefix}.m.{i}.cv3")
            )
            for j in range(2):
                ks += _conv_keys(f"{prefix}.m.{i}.m.{j}.cv1")
                ks += _conv_keys(f"{prefix}.m.{i}.m.{j}.cv2")
        else:
            ks += _conv_keys(f"{prefix}.m.{i}.cv1") + _conv_keys(f"{prefix}.m.{i}.cv2")
    return ks


def _yolo11n_state_keys():
    """All state-dict keys of an ultralytics yolo11n DetectionModel (depth 0.50:
    every C3k2/C2PSA has n=1; c3k=True at layers 6/8/22 for the n scale)."""
    ks = []
    ks += _conv_keys("model.0") + _conv_keys("model.1")
    ks += _c3k2_keys("model.2", 1, False)
    ks += _conv_keys("model.3") + _c3k2_keys("model.4", 1, False)
    ks += _conv_keys("model.5") + _c3k2_keys("model.6", 1, True)
    ks += _conv_keys("model.7") + _c3k2_keys("model.8", 1, True)
    ks += _conv_keys("model.9.cv1") + _conv_keys("model.9.cv2")  # SPPF
    # C2PSA (layer 10): cv1, cv2, one PSABlock (attn qkv/proj/pe + ffn 0/1)
    ks += _conv_keys("model.10.cv1") + _conv_keys("model.10.cv2")
    ks += _conv_keys("model.10.m.0.attn.qkv")
    ks += _conv_keys("model.10.m.0.attn.proj")
    ks += _conv_keys("model.10.m.0.attn.pe")
    ks += _conv_keys("model.10.m.0.ffn.0") + _conv_keys("model.10.m.0.ffn.1")
    ks += _c3k2_keys("model.13", 1, False) + _c3k2_keys("model.16", 1, False)
    ks += _conv_keys("model.17") + _c3k2_keys("model.19", 1, False)
    ks += _conv_keys("model.20") + _c3k2_keys("model.22", 1, True)
    for s in range(3):  # head: box branch (Conv, Conv, Conv2d)
        ks += _conv_keys(f"model.23.cv2.{s}.0")
        ks += _conv_keys(f"model.23.cv2.{s}.1")
        ks += [f"model.23.cv2.{s}.2.weight", f"model.23.cv2.{s}.2.bias"]
    for s in range(3):  # cls branch (Seq(DWConv, Conv) x2, Conv2d)
        for a in range(2):
            ks += _conv_keys(f"model.23.cv3.{s}.{a}.0")
            ks += _conv_keys(f"model.23.cv3.{s}.{a}.1")
        ks += [f"model.23.cv3.{s}.2.weight", f"model.23.cv3.{s}.2.bias"]
    ks.append("model.23.dfl.conv.weight")
    return ks


def test_yolo11_roundtrip_exact():
    """Same inverse-mapped round trip for the genuine yolo11 graph (C3k2 nests,
    C2PSA attention convs, DW-separable cls head)."""
    import jax

    _, variables = build_yolo("yolo11n", num_classes=80, imgsz=64, seed=0)
    counter = [0]

    def fill(x):
        counter[0] += 1
        return np.full(np.asarray(x).shape, float(counter[0]), np.float32)

    target = jax.tree_util.tree_map(fill, jax.tree_util.tree_map(np.asarray, dict(variables)))

    state = {}
    for key in _yolo11n_state_keys():
        m = ult_key_to_flax(key, "yolo11n")
        if m is None:
            state[key] = (
                np.zeros((), np.int64)
                if key.endswith("num_batches_tracked")
                else np.arange(16, dtype=np.float32).reshape(1, 16, 1, 1)
            )
            continue
        coll, path, transpose = m
        v = _get(target[coll], path)
        state[key] = np.transpose(v, (3, 2, 0, 1)) if transpose else v

    converted = convert_to_flax(state, variables, variant="yolo11n")
    flat_t, _ = jax.tree_util.tree_flatten(target)
    flat_c, _ = jax.tree_util.tree_flatten(converted)
    assert len(flat_t) == len(flat_c)
    for a, b in zip(flat_t, flat_c):
        np.testing.assert_array_equal(a, b)


def test_gamma_beta_not_swapped(model_vars):
    """BN gamma (weight) must land on flax 'scale', beta (bias) on 'bias' — they
    share a shape, which is exactly what broke positional pairing."""
    m = ult_key_to_flax("model.0.bn.weight")
    assert m[0] == "params" and m[1][-1] == "scale"
    m = ult_key_to_flax("model.0.bn.bias")
    assert m[0] == "params" and m[1][-1] == "bias"
    m = ult_key_to_flax("model.0.bn.running_mean")
    assert m[0] == "batch_stats" and m[1][-1] == "mean"


def test_incomplete_checkpoint_raises(model_vars):
    state = {}
    for key in _v8n_state_keys()[:20]:
        m = ult_key_to_flax(key)
        if m is None:
            continue
        coll, path, transpose = m
        v = _get(dict(model_vars)[coll], path)
        state[key] = np.transpose(v, (3, 2, 0, 1)) if transpose else v
    with pytest.raises(ValueError):
        convert_to_flax(state, model_vars)


def test_wrong_shape_raises(model_vars):
    key = "model.0.conv.weight"
    coll, path, _ = ult_key_to_flax(key)
    v = _get(dict(model_vars)[coll], path)
    state = {key: np.zeros((v.shape[3] + 1, v.shape[2], v.shape[0], v.shape[1]), np.float32)}
    with pytest.raises(ValueError):
        convert_to_flax(state, model_vars)
