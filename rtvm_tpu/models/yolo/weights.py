"""Ultralytics .pt -> Flax parameter conversion.

The reference snapshot's checkpoint files (yolov8n/s/l.pt, yolo11n.pt,
yolov8x-worldv2.pt — reference main.py:44,51) were stripped from the mirror
(.MISSING_LARGE_BLOBS), so conversion is exercised only when a user supplies a
checkpoint. Torch (CPU wheel) is used purely as a weight reader.

Mapping is done by NAME, not position: an explicit table translates each
ultralytics state-dict key (``model.<idx>.<submodule>.<tensor>``) to the flax
variable path in our model.py graph. Positional pairing is unusable here — flax
flattens paths alphabetically (Conv_10 < Conv_2) and interleaves batch_stats
separately from params, while torch interleaves conv/bn tensors per module; and
BN gamma/beta share a shape, so any shape-based pairing can silently swap them.

Layout conversion: torch convs are OIHW, flax convs are HWIO; BN running stats go
to the ``batch_stats`` collection, gamma/beta to ``params`` (scale/bias).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

# ultralytics DetectionModel layer index -> our flax top-level module name
# (model.py YOLOv8.__call__ declaration order; indices 10/11/13/14/17/20 are
# parameter-free Upsample/Concat layers).
_TOP = {
    "0": "ConvBnSiLU_0",
    "1": "ConvBnSiLU_1",
    "2": "C2f_0",
    "3": "ConvBnSiLU_2",
    "4": "C2f_1",
    "5": "ConvBnSiLU_3",
    "6": "C2f_2",
    "7": "ConvBnSiLU_4",
    "8": "C2f_3",
    "9": "SPPF_0",
    "12": "C2f_4",
    "15": "C2f_5",
    "16": "ConvBnSiLU_5",
    "18": "C2f_6",
    "19": "ConvBnSiLU_6",
    "21": "C2f_7",
    "22": "DetectHead_0",
}

# yolo11.yaml layer indices (11/14 Upsample, 12/15/18/21 Concat are
# parameter-free) -> model.py yolo11_features declaration order.
_TOP11 = {
    "0": "ConvBnSiLU_0",
    "1": "ConvBnSiLU_1",
    "2": "C3k2_0",
    "3": "ConvBnSiLU_2",
    "4": "C3k2_1",
    "5": "ConvBnSiLU_3",
    "6": "C3k2_2",
    "7": "ConvBnSiLU_4",
    "8": "C3k2_3",
    "9": "SPPF_0",
    "10": "C2PSA_0",
    "13": "C3k2_4",
    "16": "C3k2_5",
    "17": "ConvBnSiLU_5",
    "19": "C3k2_6",
    "20": "ConvBnSiLU_6",
    "22": "C3k2_7",
    "23": "DetectHead_0",
}


def c3k_layer_indices(variant: str) -> frozenset:
    """Ultralytics layer indices whose C3k2 runs with c3k=True — needed to
    disambiguate ``m.i.cv1`` keys (plain Bottleneck vs nested C3k). Derived
    from model.yolo11_c3k_flags, the single source of truth the architecture
    itself consumes, so converter and graph cannot drift."""
    from rtvm_tpu.models.yolo.model import yolo11_c3k_flags

    return frozenset(i for i, f in yolo11_c3k_flags(variant).items() if f)


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


def _conv_bn_path(rest: Tuple[str, ...], scope: Tuple[str, ...]):
    """Translate the tail of an ultralytics Conv(conv+bn) module key.

    rest is e.g. ('conv', 'weight') or ('bn', 'running_mean'); scope is the flax
    path of the enclosing ConvBnSiLU module. Returns (collection, full path,
    needs_conv_transpose) or None for ignorable tensors."""
    if rest == ("conv", "weight"):
        return "params", scope + ("Conv_0", "kernel"), True
    if rest == ("bn", "weight"):
        return "params", scope + ("BatchNorm_0", "scale"), False
    if rest == ("bn", "bias"):
        return "params", scope + ("BatchNorm_0", "bias"), False
    if rest == ("bn", "running_mean"):
        return "batch_stats", scope + ("BatchNorm_0", "mean"), False
    if rest == ("bn", "running_var"):
        return "batch_stats", scope + ("BatchNorm_0", "var"), False
    if rest[-1] == "num_batches_tracked":
        return None
    raise KeyError(f"unrecognized Conv-module tensor: {'.'.join(rest)}")


def ult_key_to_flax(key: str, variant: str = "yolov8n"):
    """Map one ultralytics state-dict key to (collection, flax path, transpose).

    ``variant`` picks the graph: v8 names use the C2f table, 11-series names the
    C3k2/C2PSA table (c3k placement depends on the scale — c3k_layer_indices).
    Returns None for tensors with no flax counterpart (num_batches_tracked, the
    fixed DFL expectation conv). Raises KeyError for unknown structure (e.g. a
    yolo11 C3k2 checkpoint fed to the v8 graph)."""
    is11 = variant.startswith("yolo11")
    top_map = _TOP11 if is11 else _TOP
    parts = key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    idx, rest = parts[0], tuple(parts[1:])
    if idx not in top_map:
        raise KeyError(f"unmapped ultralytics layer index in key: {key}")
    top = top_map[idx]

    if top.startswith("ConvBnSiLU"):
        return _conv_bn_path(rest, (top,))

    if top.startswith("C2f"):
        # ultralytics C2f declares cv1, cv2, m.[i] (state-dict order); our C2f
        # declares cv1 -> ConvBnSiLU_0, bottlenecks -> Bottleneck_i, cv2 ->
        # ConvBnSiLU_1 (modules.py C2f).
        if rest[0] == "cv1":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_0"))
        if rest[0] == "cv2":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_1"))
        if rest[0] == "m":
            i = rest[1]
            sub = {"cv1": "ConvBnSiLU_0", "cv2": "ConvBnSiLU_1"}[rest[2]]
            return _conv_bn_path(rest[3:], (top, f"Bottleneck_{i}", sub))
        raise KeyError(f"unrecognized C2f tensor: {key}")

    if top.startswith("C3k2"):
        # ultralytics C3k2: cv1, cv2, m.[i] where m.i is a C3k (cv1/cv2/cv3 +
        # m.[j] bottlenecks) when c3k else a plain Bottleneck (cv1/cv2). Our
        # C3k2: ConvBnSiLU_0 (cv1), C3k_i | Bottleneck_i, ConvBnSiLU_1 (cv2);
        # our C3k: ConvBnSiLU_0 (cv1/a), ConvBnSiLU_1 (cv2/b), Bottleneck_j,
        # ConvBnSiLU_2 (cv3).
        if rest[0] == "cv1":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_0"))
        if rest[0] == "cv2":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_1"))
        if rest[0] == "m":
            i = rest[1]
            if idx in c3k_layer_indices(variant):
                c3k = (top, f"C3k_{i}")
                if rest[2] == "cv1":
                    return _conv_bn_path(rest[3:], c3k + ("ConvBnSiLU_0",))
                if rest[2] == "cv2":
                    return _conv_bn_path(rest[3:], c3k + ("ConvBnSiLU_1",))
                if rest[2] == "cv3":
                    return _conv_bn_path(rest[3:], c3k + ("ConvBnSiLU_2",))
                if rest[2] == "m":
                    j = rest[3]
                    sub = {"cv1": "ConvBnSiLU_0", "cv2": "ConvBnSiLU_1"}[rest[4]]
                    return _conv_bn_path(rest[5:], c3k + (f"Bottleneck_{j}", sub))
            else:
                sub = {"cv1": "ConvBnSiLU_0", "cv2": "ConvBnSiLU_1"}[rest[2]]
                return _conv_bn_path(rest[3:], (top, f"Bottleneck_{i}", sub))
        raise KeyError(f"unrecognized C3k2 tensor: {key}")

    if top.startswith("C2PSA"):
        # ultralytics C2PSA: cv1, cv2, m.[i] PSABlock(attn{qkv,proj,pe},
        # ffn{0,1}). Ours: ConvBnSiLU_0 (cv1), PSABlock_i (SpatialAttention_0
        # with ConvBn_0=qkv / ConvBn_1=pe / ConvBn_2=proj, ConvBnSiLU_0=ffn.0,
        # ConvBn_0=ffn.1), ConvBnSiLU_1 (cv2).
        if rest[0] == "cv1":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_0"))
        if rest[0] == "cv2":
            return _conv_bn_path(rest[1:], (top, "ConvBnSiLU_1"))
        if rest[0] == "m":
            blk = (top, f"PSABlock_{rest[1]}")
            if rest[2] == "attn":
                sub = {"qkv": "ConvBn_0", "pe": "ConvBn_1", "proj": "ConvBn_2"}[rest[3]]
                return _conv_bn_path(rest[4:], blk + ("SpatialAttention_0", sub))
            if rest[2] == "ffn":
                sub = {"0": "ConvBnSiLU_0", "1": "ConvBn_0"}[rest[3]]
                return _conv_bn_path(rest[4:], blk + (sub,))
        raise KeyError(f"unrecognized C2PSA tensor: {key}")

    if top.startswith("SPPF"):
        sub = {"cv1": "ConvBnSiLU_0", "cv2": "ConvBnSiLU_1"}[rest[0]]
        return _conv_bn_path(rest[1:], (top, sub))

    if top.startswith("DetectHead"):
        if rest[0] == "dfl":
            return None  # fixed arange conv == our dfl_expectation, not a weight
        branch, s, j = rest[0], int(rest[1]), rest[2]
        if branch not in ("cv2", "cv3"):
            raise KeyError(f"unrecognized head tensor: {key}")
        if is11:
            # yolo11 head (legacy=False): cv2.s = (Conv, Conv, Conv2d) box;
            # cv3.s = (Seq(DWConv, Conv), Seq(DWConv, Conv), Conv2d) cls. Our
            # dw_cls head creates per scale: ConvBnSiLU_{6s}..{6s+1} (box),
            # ConvBnSiLU_{6s+2}..{6s+5} (cls), Conv_{2s} (box), Conv_{2s+1}.
            if branch == "cv2":
                if j in ("0", "1"):
                    return _conv_bn_path(rest[3:], (top, f"ConvBnSiLU_{6 * s + int(j)}"))
                if j == "2":
                    return _head_final_conv(rest[3:], top, f"Conv_{2 * s}", key)
            else:
                if j in ("0", "1"):
                    sub = f"ConvBnSiLU_{6 * s + 2 + 2 * int(j) + int(rest[3])}"
                    return _conv_bn_path(rest[4:], (top, sub))
                if j == "2":
                    return _head_final_conv(rest[3:], top, f"Conv_{2 * s + 1}", key)
            raise KeyError(f"unrecognized head tensor: {key}")
        # v8 head: cv2 = box branch, cv3 = cls branch; per scale s the
        # Sequential is (Conv, Conv, Conv2d). Our DetectHead creates, per scale:
        # ConvBnSiLU_{4s}, ConvBnSiLU_{4s+1}, Conv_{2s} (box) then
        # ConvBnSiLU_{4s+2}, ConvBnSiLU_{4s+3}, Conv_{2s+1} (cls).
        boff = 0 if branch == "cv2" else 2
        if j in ("0", "1"):
            sub = f"ConvBnSiLU_{4 * s + boff + int(j)}"
            return _conv_bn_path(rest[3:], (top, sub))
        if j == "2":  # plain conv with bias
            return _head_final_conv(
                rest[3:], top, f"Conv_{2 * s + (0 if branch == 'cv2' else 1)}", key
            )
        raise KeyError(f"unrecognized head tensor: {key}")

    raise KeyError(f"unmapped key: {key}")


def _head_final_conv(rest: Tuple[str, ...], top: str, conv: str, key: str):
    if rest[0] == "weight":
        return "params", (top, conv, "kernel"), True
    if rest[0] == "bias":
        return "params", (top, conv, "bias"), False
    raise KeyError(f"unrecognized head tensor: {key}")


def convert_to_flax(
    state: Dict[str, np.ndarray], variables: Any, variant: str = "yolov8n"
) -> Any:
    """Convert an ultralytics v8/11 state dict onto our Flax variable tree by name.

    Every torch tensor must land on a flax leaf of identical shape, and every
    flax leaf must be written exactly once — both checked, so partial or
    misaligned loads raise instead of silently mixing converted and random
    weights."""
    import jax

    def to_mutable(d):
        if hasattr(d, "items"):
            return {k: to_mutable(v) for k, v in d.items()}
        return np.asarray(d)

    out = to_mutable(variables)
    written = set()

    def set_leaf(collection: str, path: Tuple[str, ...], value: np.ndarray, key: str):
        node = out[collection]
        for p in path[:-1]:
            if p not in node:
                raise KeyError(f"{key}: flax path {collection}/{'/'.join(path)} missing at {p}")
            node = node[p]
        leaf = node.get(path[-1])
        if leaf is None:
            raise KeyError(f"{key}: flax leaf {collection}/{'/'.join(path)} not found")
        if np.asarray(leaf).shape != value.shape:
            raise ValueError(
                f"{key}: shape {value.shape} != flax {collection}/{'/'.join(path)} "
                f"shape {np.asarray(leaf).shape}"
            )
        node[path[-1]] = value.astype(np.float32)
        written.add((collection,) + path)

    for key, tensor in state.items():
        m = ult_key_to_flax(key, variant)
        if m is None:
            continue
        collection, path, transpose = m
        set_leaf(collection, path, _conv_to_flax(tensor) if transpose else tensor, key)

    flat, _ = jax.tree_util.tree_flatten_with_path(out)
    all_paths = {
        tuple(getattr(p, "key", getattr(p, "name", str(p))) for p in path)
        for path, _ in flat
    }
    missing = all_paths - written
    if missing:
        raise ValueError(
            f"{len(missing)} flax leaves not covered by the checkpoint, e.g. "
            f"{sorted(missing)[:5]}"
        )
    return out
