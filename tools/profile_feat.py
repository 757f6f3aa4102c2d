"""Micro-profile of the ORB feature path, batched over 16 frames in one jit.

    python tools/profile_feat.py <stage>
    stages: gray16, blur16, score16, nms_topk16, detect16, patches16, orient16,
            bits16, pack16, full16
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "full16"
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color
    from rtvm_tpu.ops.features import fast as F, orb as O
    from rtvm_tpu.ops.filters import gaussian_blur

    VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    m = S.VideMosaic(f0, detector_type="orb", config=MosaicConfig(window_size=16))
    cfg = m.config
    f = cfg.features
    int(jnp.int32(0))
    dwin = jnp.asarray(frames)

    import functools

    @functools.lru_cache()
    def grays_():
        return jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr))(dwin)

    @functools.lru_cache()
    def kps16_():
        return jax.jit(
            lambda g: jax.vmap(
                lambda gg: F.detect_fast(gg, f.max_keypoints, f.fast_threshold, f.border_margin, f.fast_arc_length)
            )(g)
        )(grays_())

    @functools.lru_cache()
    def smooth16_():
        return jax.jit(lambda g: jax.vmap(lambda gg: jnp.clip(gaussian_blur(gg, f.brief_blur_sigma), 0, 255).astype(jnp.uint8))(g))(grays_())

    @functools.lru_cache()
    def patches16_():
        return jax.jit(lambda s, k: jax.vmap(O.extract_patches)(s, k))(smooth16_(), kps16_())

    idx1, idx2 = O._rotated_index_tables(f.brief_bits, f.brief_patch_radius)
    i1, i2 = jnp.asarray(idx1), jnp.asarray(idx2)
    mx, my = O._moment_masks(f.orientation_radius)

    def bits_fn(patches):
        k = patches.shape[0]
        flat = patches.reshape(k, O.PATCH * O.PATCH)
        return flat[:, i1] < flat[:, i2]

    def orient_fn(patches):
        pf = patches.astype(jnp.float32)
        m10 = jnp.einsum("kpq,pq->k", pf, jnp.asarray(mx))
        m01 = jnp.einsum("kpq,pq->k", pf, jnp.asarray(my))
        return jnp.arctan2(m01, m10)

    # (fn builder, args builder) — args built lazily so only the needed
    # sub-pipelines compile/run before measurement
    fns = {
        "gray16": (lambda fr: jax.vmap(color.bgr2gray)(fr), lambda: (dwin,)),
        "blur16": (lambda g: jax.vmap(lambda gg: gaussian_blur(gg, f.brief_blur_sigma))(g), lambda: (grays_(),)),
        "score16": (lambda g: jax.vmap(lambda gg: F.fast_score_map(gg, f.fast_threshold, f.fast_arc_length))(g), lambda: (grays_(),)),
        "detect16": (
            lambda g: jax.vmap(
                lambda gg: F.detect_fast(gg, f.max_keypoints, f.fast_threshold, f.border_margin, f.fast_arc_length)
            )(g),
            lambda: (grays_(),),
        ),
        "patches16": (lambda s, k: jax.vmap(O.extract_patches)(s, k), lambda: (smooth16_(), kps16_())),
        "desc16": (
            lambda g, k: jax.vmap(
                lambda gg, kk: O.describe_orb(gg, kk, n_bits=f.brief_bits, pattern_radius=f.brief_patch_radius,
                                              blur_sigma=f.brief_blur_sigma, orientation_radius=f.orientation_radius)
            )(g, k),
            lambda: (grays_(), kps16_()),
        ),
        "full16": (lambda fr: jax.vmap(lambda x: S._extract_features(color.bgr2gray(x), cfg))(fr), lambda: (dwin,)),
        "bits16": (lambda p: jax.vmap(bits_fn)(p), lambda: (patches16_(),)),
        "orient16": (lambda p: jax.vmap(orient_fn)(p), lambda: (patches16_(),)),
    }

    fn_raw, args_fn = fns[stage]
    args = args_fn()
    jax.block_until_ready(args)
    fn = jax.jit(fn_raw)
    jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{stage:12s} min {min(ts)*1000:7.2f} ms  all {[round(t*1000,2) for t in ts]}")


if __name__ == "__main__":
    main()
