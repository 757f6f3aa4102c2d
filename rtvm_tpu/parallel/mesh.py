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
