"""Stage-by-stage timing of the mosaic window step on the TPU.

The axon tunnel latches into a throttled mode after ~1 s of cumulative device
work per process (NOTES_ROUND1.md), so each stage is measured in its own burst
and the per-stage order can be chosen via argv to cross-check. Usage:

    python tools/profile_step.py [stage ...]   # default: all stages
"""

import os
import sys
import time

import numpy as np

# NOTE: do NOT use PYTHONPATH for this — the env var breaks the axon TPU
# plugin's backend discovery in this image; an in-process sys.path insert works.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(stages):
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color, warp as W

    VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    m = S.VideMosaic(f0, detector_type="orb", config=MosaicConfig(window_size=16))
    cfg = m.config  # detector_type override applied
    int(jnp.int32(0))

    hc, wc = m.canvas_shape[:2]
    dwin = jnp.asarray(frames)
    H = jnp.asarray(np.array([[1.0, 0.01, 30.0], [-0.01, 1.0, 300.0], [1e-5, -1e-5, 1.0]], np.float32))
    fcm = jnp.moveaxis(dwin[0].astype(jnp.float32), -1, 0)

    def timeit(name, fn, reps=3):
        fn()  # compile
        jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(ts) * 1000:8.2f} ms  (x16 = {min(ts) * 16000:7.1f})")

    defs = {}

    # 1. batched features (16 frames, one dispatch)
    feat = jax.jit(lambda fr: jax.vmap(lambda f: S._extract_features(color.bgr2gray(f), cfg))(fr))
    defs["features16"] = lambda: feat(dwin)

    # 2. warp 16x in a scan (two-pass + analytic weight), chained via H jitter
    def warp_scan(f, h0):
        def body(h, _):
            px, w = W.warp_frame_cm(f, m._fweight, h, hc, wc)
            h = h + px[0, :3, :3] * 1e-12  # data dependence, numerically nil
            return h, (px[0, 0, 0], w[0, 0])
        return jax.lax.scan(body, h0, None, length=16)

    warp16 = jax.jit(warp_scan)
    defs["warp16_scan"] = lambda: warp16(fcm, H)

    # 3. union EDT + upsample + blend, 16x chained on the carried canvas
    canvas = jnp.array(m.state.canvas)  # copy: process_window donates the originals
    union = jnp.array(m.state.union_coarse)
    wn = W.analytic_frame_weight(H, 360, 640, hc, wc)
    npx = jnp.zeros_like(canvas)

    def blend_scan(cv0, un0, px, w):
        def body(carry, _):
            cv, un = carry
            wo = W.union_weight(cv, un, hc, wc)
            cv, _ = W._blend_cm(cv, wo, px, w)
            un = un | W.coarse_footprint(w)
            return (cv, un), ()
        return jax.lax.scan(body, (cv0, un0), None, length=16)

    blend16 = jax.jit(blend_scan)
    defs["edt+blend16_scan"] = lambda: blend16(canvas, union, npx, wn)

    # 4. EDT alone, 16x chained
    def edt_scan(u0):
        def body(d, _):
            d2 = W.coarse_union_distance(u0) + d * 0.0
            return d2, ()
        return jax.lax.scan(body, jnp.zeros_like(u0, jnp.float32), None, length=16)

    edt16 = jax.jit(edt_scan)
    defs["edt16_scan"] = lambda: edt16(union)

    # 5. match+ransac for 16 pairs (one dispatch, vmapped)
    kps, descs, valids = feat(dwin)
    kp_prev = jnp.concatenate([kps[-1:], kps[:-1]])
    desc_prev = jnp.concatenate([descs[-1:], descs[:-1]])
    valid_prev = jnp.concatenate([valids[-1:], valids[:-1]])
    from rtvm_tpu.geometry import homography as geo
    from rtvm_tpu.ops import match as match_ops

    rc = cfg.ransac

    def pair_fn(kq, dq, vq, kt, dt, vt, key):
        mm = match_ops.match_hamming_crosscheck(dq, vq, dt, vt)
        src, dst, mvalid = match_ops.gather_correspondences(kq, kt, mm)
        res = geo.ransac_homography(
            src, dst, mvalid, key,
            num_hypotheses=rc.num_hypotheses,
            reproj_threshold=rc.reproj_threshold,
            refine_iterations=rc.refine_iterations,
            min_matches=rc.min_matches,
        )
        return res.H, res.num_inliers

    keys = jax.vmap(lambda i: jax.random.fold_in(m._key, i))(jnp.arange(16))
    mr = jax.jit(lambda: jax.vmap(pair_fn)(kps, descs, valids, kp_prev, desc_prev, valid_prev, keys))
    defs["match_ransac16"] = lambda: mr()

    # 6. full window step
    defs["window16"] = lambda: m.process_window(dwin)

    for s in stages or list(defs):
        timeit(s, defs[s])


if __name__ == "__main__":
    main(sys.argv[1:])
