"""Device-mesh parallelism for the mosaic engine.

The reference has no distributed execution at all (SURVEY.md section 2.7); this module
defines the multi-chip story for the TPU rebuild:

- **dp** (data parallel): independent work items — frames in a detection/feature batch,
  images in batch mode — sharded across chips; no cross-talk except final gathers.
- **tp** (tensor parallel): within-frame parallelism — canvas rows for warp/blend and
  detector feature maps are sharded; XLA inserts the collectives (all-gather for the
  warp transpose, psum for reductions) over ICI.

Shardings are expressed with jax.sharding.NamedSharding + PartitionSpec and applied
via jit in_shardings/out_shardings (pjit style).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, dp: Optional[int] = None, tp: Optional[int] = None) -> Mesh:
    """Build a (dp, tp) mesh over the first n_devices devices. Defaults: tp = largest
    power of two <= sqrt(n), dp = n / tp."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if tp is None:
        tp = 1
        while tp * 2 <= int(math.isqrt(n)) and n % (tp * 2) == 0:
            tp *= 2
    if dp is None:
        dp = n // tp
    assert dp * tp == n, (dp, tp, n)
    return Mesh(devices.reshape(dp, tp), ("dp", "tp"))


def shard_batch(mesh: Mesh, x, axis: int = 0):
    """Place a batch array with its leading axis sharded over dp."""
    spec = [None] * x.ndim
    spec[axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def dryrun_multichip(n_devices: int) -> None:
    """Compile + run one multi-chip mosaic batch step on tiny shapes.

    Shardings exercised:
      - frames batch: dp over the window axis (feature extraction / matching / RANSAC
        are per-frame independent until the scan);
      - canvas + canvas weight: tp over canvas rows (warp+blend row-sharded; the
        two-pass warp's transposes force XLA all-to-alls across tp);
      - small state (H, descriptors, histories): replicated.
    """
    import jax.numpy as jnp

    from rtvm_tpu.config import FeatureConfig, MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S

    # Dryrun runs on a virtual-CPU mesh: this image pins JAX_PLATFORMS=axon via a
    # plugin (env vars are ignored), so the switch must happen through jax.config
    # BEFORE the backend initializes. If a backend is already live (RuntimeError),
    # fall through and hope the live platform has enough devices.
    try:
        jax.config.update("jax_num_cpu_devices", n_devices)
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass
    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())} "
            "(call dryrun_multichip before any other JAX use in the process)"
        )

    mesh = make_mesh(n_devices)
    dp = mesh.devices.shape[0]

    h, w = 64, 128
    b = max(2, dp)
    cfg = MosaicConfig(
        window_size=b,
        output_height_times=2.0,
        output_width_times=1.25,
        features=FeatureConfig(detector_type="orb", max_keypoints=64, border_margin=8),
    )
    rng = np.random.RandomState(0)
    first = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    m = S.VideMosaic(first, detector_type="orb", config=cfg)
    step_fn = S.make_window_step((h, w, 3), cfg).__wrapped__  # un-jitted python fn

    repl = NamedSharding(mesh, P())
    canvas_sh = NamedSharding(mesh, P(None, "tp", None))  # [3, Hc, Wc] rows sharded
    union_sh = NamedSharding(mesh, P("tp", None))
    frames_sh = NamedSharding(mesh, P("dp", None, None, None))

    state_shardings = S.MosaicState(
        canvas=canvas_sh,
        union_coarse=union_sh,
        H_old=repl,
        kp=repl,
        desc=repl,
        kp_valid=repl,
        hbuf=repl,
        hcount=repl,
        frame_idx=repl,
    )
    aux_shardings = S.WindowAux(
        num_matches=repl, num_inliers=repl, H_abs=repl, ok=repl, blended=repl,
        two_pass=repl,
    )

    step = jax.jit(
        step_fn,
        in_shardings=(state_shardings, frames_sh, repl, repl, repl),
        out_shardings=(state_shardings, aux_shardings),
    )

    frames = jnp.asarray(rng.randint(0, 255, (b, h, w, 3), dtype=np.uint8))
    state = jax.device_put(m.state, state_shardings)
    frames = jax.device_put(frames, frames_sh)

    new_state, aux = step(state, frames, m._key, jax.device_put(m._fweight, repl), jax.device_put(m._wtable, repl))
    jax.block_until_ready(new_state.canvas)
    assert new_state.frame_idx == m.state.frame_idx + b
    print(
        f"dryrun_multichip ok: mesh={mesh.devices.shape} dp={dp} "
        f"canvas={new_state.canvas.shape} sharding={new_state.canvas.sharding}"
    )

    _dryrun_yolo_train(mesh)
    _dryrun_detection_dp(mesh)

    import os

    if os.environ.get("RTVM_DRYRUN_PROD", "1") != "0":
        _dryrun_production(mesh)


def _dryrun_detection_dp(mesh: Mesh) -> None:
    """dp-sharded batched detection inference (SURVEY section 2.7: the detection
    batch is THE dp axis for multi-chip). Full jitted path: preprocess ->
    backbone -> decode -> per-frame NMS, batch sharded over dp."""
    import jax.numpy as jnp

    from rtvm_tpu.models.yolo.model import build_yolo
    from rtvm_tpu.models.yolo import postprocess as pp

    dp = mesh.devices.shape[0]
    b = max(2, dp)
    model, variables = build_yolo("yolov8n", num_classes=8, imgsz=128)

    def infer(frames_u8):
        x = frames_u8[..., ::-1].astype(jnp.float32) / 255.0
        box_l, cls_l = model.apply(variables, x, train=False)
        boxes, scores = pp.decode_predictions(box_l, cls_l, model.cfg.strides, model.cfg.reg_max)
        return jax.vmap(lambda bx, sc: pp.nms_fixed(bx, sc, 0.25, 0.45))(boxes, scores)

    dp_sh = NamedSharding(mesh, P("dp", None, None, None))
    step = jax.jit(infer, in_shardings=(dp_sh,))
    rng = np.random.RandomState(2)
    frames = jax.device_put(
        jnp.asarray(rng.randint(0, 255, (b, 128, 128, 3), dtype=np.uint8)), dp_sh
    )
    det = step(frames)
    jax.block_until_ready(det.boxes)
    print(f"dp detection dryrun ok: batch={b} boxes={det.boxes.shape} mesh={mesh.devices.shape}")


def _dryrun_production(mesh: Mesh) -> None:
    """One PRODUCTION-shape sharded window step (round-2 VERDICT item 5): real
    360p frames (360x640), K=700 keypoints, the real 720x768 canvas, window 8 —
    the exact shapes the single-chip bench runs, on the virtual mesh."""
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S

    h, w, b = 360, 640, 8
    cfg = MosaicConfig(window_size=b)  # defaults: K=700, canvas 2.0x1.2
    rng = np.random.RandomState(1)
    base = rng.randint(0, 255, (h + 2 * b, w + 2 * b, 3), dtype=np.uint8)
    first = base[:h, :w].copy()
    frames = np.stack([base[2 * i : 2 * i + h, 2 * i : 2 * i + w] for i in range(b)])

    m = S.VideMosaic(first, detector_type="orb", config=cfg)
    # m.config carries the orb detector replacement — the raw cfg would build a
    # SIFT step against ORB descriptors in the state
    step_py = S.make_window_step((h, w, 3), m.config).__wrapped__

    repl = NamedSharding(mesh, P())
    state_sh = S.MosaicState(
        canvas=NamedSharding(mesh, P(None, "tp", None)),
        union_coarse=NamedSharding(mesh, P("tp", None)),
        H_old=repl, kp=repl, desc=repl, kp_valid=repl,
        hbuf=repl, hcount=repl, frame_idx=repl,
    )
    aux_sh = S.WindowAux(
        num_matches=repl, num_inliers=repl, H_abs=repl, ok=repl,
        blended=repl, two_pass=repl,
    )
    frames_sh = NamedSharding(mesh, P("dp", None, None, None))
    step = jax.jit(
        step_py,
        in_shardings=(state_sh, frames_sh, repl, repl, repl),
        out_shardings=(state_sh, aux_sh),
    )
    st = jax.device_put(m.state, state_sh)
    fr = jax.device_put(jnp.asarray(frames), frames_sh)
    new_state, aux = step(
        st, fr, m._key, jax.device_put(m._fweight, repl), jax.device_put(m._wtable, repl)
    )
    jax.block_until_ready(new_state.canvas)
    ok = int(np.asarray(aux.ok).sum())
    assert int(new_state.frame_idx) == b + 1
    print(
        f"production dryrun ok: 360p window={b} K={cfg.features.max_keypoints} "
        f"canvas={new_state.canvas.shape} ok_frames={ok}/{b} "
        f"sharding={new_state.canvas.sharding.spec}"
    )


def _dryrun_yolo_train(mesh: Mesh) -> None:
    """One sharded YOLO training step: dp over the batch, sp (spatial tensor
    parallelism) over image rows — XLA inserts the conv halo exchanges."""
    import jax.numpy as jnp
    import optax

    from rtvm_tpu.models.yolo.model import build_yolo
    from rtvm_tpu.models.yolo.train import Targets, init_train_state, make_train_step

    dp = mesh.devices.shape[0]
    model, variables = build_yolo("yolov8n", num_classes=8, imgsz=64)
    state, tx = init_train_state(model, variables)
    raw_step = make_train_step(model, tx)

    repl = NamedSharding(mesh, P())
    img_sh = NamedSharding(mesh, P("dp", "tp", None, None))  # batch dp x rows sp

    def sharded_step(st, images, targets):
        images = jax.lax.with_sharding_constraint(images, img_sh)
        return raw_step(st, images, targets)

    step = jax.jit(sharded_step)

    b = max(2, dp)
    rngn = np.random.RandomState(0)
    images = jnp.asarray(rngn.rand(b, 64, 64, 3).astype(np.float32))
    targets = Targets(
        boxes=jnp.asarray(
            np.tile(np.array([[8.0, 8.0, 40.0, 40.0], [20.0, 24.0, 56.0, 60.0]], np.float32)[None], (b, 1, 1))
        ),
        classes=jnp.zeros((b, 2), jnp.int32),
        valid=jnp.ones((b, 2), bool),
    )
    state = jax.device_put(state, repl)
    images = jax.device_put(images, img_sh)
    new_state, metrics = step(state, images, targets)
    jax.block_until_ready(new_state.params)
    assert int(new_state.step) == 1
    print(f"yolo train dryrun ok: loss={float(metrics['loss']):.3f} mesh={mesh.devices.shape}")
