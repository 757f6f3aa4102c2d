"""Stage-by-stage timing of the SIFT feature path, batched over a 16-frame
window in one jit (config-2 hot path; round-2 VERDICT item 8).

    python tools/profile_sift.py [stage ...]
    stages: gray, pyramid, detect, patches, desc, features, match, ransac, step

Each stage runs in its own burst (min of reps) to dodge the tunnel throttle;
run single stages in separate invocations to cross-check.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"


def main(stages):
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color
    from rtvm_tpu.ops.features import sift as SF

    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    cfg = MosaicConfig(window_size=16)  # default detector: sift
    m = S.VideMosaic(f0, detector_type="sift", config=cfg)
    cfg = m.config
    f = cfg.features
    int(jnp.int32(0))
    dwin = jnp.asarray(frames)

    def bench(name, fn, *args, reps=3):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            ts.append(time.perf_counter() - t0)
        print(f"{name:10s} {min(ts)*1e3:8.2f} ms  ({min(ts)*1e3/16:6.3f} ms/frame)", flush=True)
        return out

    grays = jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr))(dwin)
    jax.block_until_ready(grays)

    if "gray" in stages:
        bench("gray", jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr)), dwin)

    s = f.sift_scales
    import math

    sigma0 = f.sift_sigma
    kfac = 2.0 ** (1.0 / s)
    sigmas = np.array([sigma0 * kfac**l for l in range(s + 3)], dtype=np.float32)
    deltas = np.sqrt(np.maximum(sigmas**2 - sigmas[0] ** 2, 0.0))

    from rtvm_tpu.ops.filters import gaussian_blur

    base16 = jax.jit(
        jax.vmap(lambda g: gaussian_blur(g / 255.0, float(np.sqrt(max(sigma0**2 - 0.25, 0.01)))))
    )(grays)
    jax.block_until_ready(base16)

    if "pyramid" in stages:
        bench(
            "pyramid",
            jax.jit(jax.vmap(lambda b: SF._octave_levels(b, deltas))),
            base16,
        )

    gauss16 = jax.jit(jax.vmap(lambda b: SF._octave_levels(b, deltas)))(base16)
    dogs16 = jax.jit(jax.vmap(lambda g: g[1:] - g[:-1]))(gauss16)
    jax.block_until_ready(dogs16)
    quota = SF._octave_quotas(f.max_keypoints, f.sift_octaves)[0]

    if "detect" in stages:
        bench(
            "detect",
            jax.jit(
                jax.vmap(
                    lambda d: SF._detect_octave(
                        d, quota, f.sift_contrast_threshold, 10.0, f.border_margin
                    )
                )
            ),
            dogs16,
        )

    det16 = jax.jit(
        jax.vmap(
            lambda d: SF._detect_octave(d, quota, f.sift_contrast_threshold, 10.0, f.border_margin)
        )
    )(dogs16)
    jax.block_until_ready(det16)
    xy16, lvl16 = det16[0], det16[1]

    if "patches" in stages:
        bench(
            "patches",
            jax.jit(jax.vmap(lambda g, xy, lvl: SF._extract_level_patches(g[1 : s + 1], xy, lvl))),
            gauss16, xy16, lvl16,
        )

    patches16 = jax.jit(
        jax.vmap(lambda g, xy, lvl: SF._extract_level_patches(g[1 : s + 1], xy, lvl))
    )(gauss16, xy16, lvl16)
    jax.block_until_ready(patches16)
    sd = 6.0 * float(sigmas[s // 2 + 1])

    if "desc" in stages:
        bench(
            "desc",
            jax.jit(jax.vmap(lambda p, v: SF._orientation_and_descriptors(p, v, sd))),
            patches16, det16[3],
        )

    if "features" in stages:
        bench(
            "features",
            jax.jit(lambda g: S._extract_features_batch(g, cfg)),
            grays,
        )

    if "match" in stages or "ransac" in stages:
        from rtvm_tpu.ops import match as match_ops

        kps, descs, valids = jax.jit(lambda g: S._extract_features_batch(g, cfg))(grays)
        jax.block_until_ready(descs)
        if "match" in stages:
            bench(
                "match",
                jax.jit(
                    jax.vmap(lambda dq, vq, dt, vt: S._match_pair(dq, vq, dt, vt, cfg))
                ),
                descs, valids,
                jnp.roll(descs, 1, 0), jnp.roll(valids, 1, 0),
            )

    if "step" in stages:
        step = S.make_window_step(m.frame_shape, cfg)
        st = m.state
        st, _ = step(st, dwin, m._key, m._fweight, m._wtable)
        jax.block_until_ready(st.canvas)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st, _ = step(st, dwin, m._key, m._fweight, m._wtable)
            jax.block_until_ready(st.canvas)
            ts.append(time.perf_counter() - t0)
        print(f"{'step':10s} {min(ts)*1e3:8.2f} ms  ({min(ts)*1e3/16:6.3f} ms/frame)", flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or ["gray", "pyramid", "detect", "patches", "desc", "features", "step"]
    main(args)
