"""Per-stage timing of the PRODUCTION window step components on TPU.

Each stage is measured in its own process burst (tunnel throttling — see
NOTES_ROUND1.md item 5). Usage:

    python tools/profile_prod.py <stage>
    stages: features, match, paint, full
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(stage):
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color, match as match_ops, warp as warp_ops
    from rtvm_tpu.geometry import homography as geo

    VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    cfg = MosaicConfig(window_size=16)
    m = S.VideMosaic(f0, detector_type="orb", config=cfg)
    cfg = m.config
    int(jnp.int32(0))  # force real sync semantics (NOTES item 1)

    dwin = jnp.asarray(frames)
    hc, wc = m.canvas_shape[:2]

    def timeit(name, fn, reps=4):
        jax.block_until_ready(fn())  # compile
        jax.block_until_ready(fn())
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
        print(f"{name:14s} min {min(ts):7.1f} ms  all {[round(t,1) for t in ts]}")

    if stage == "features":
        feat = jax.jit(lambda fr: S._extract_features_batch(jax.vmap(color.bgr2gray)(fr), cfg))
        timeit("features", lambda: feat(dwin))
    elif stage == "gray":
        g = jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr))
        timeit("gray", lambda: g(dwin))
    elif stage == "fast":
        from rtvm_tpu.ops.features import fast as fast_ops

        f = cfg.features
        det = jax.jit(
            lambda fr: jax.vmap(
                lambda gg: fast_ops.detect_fast(
                    gg, f.max_keypoints, f.fast_threshold, f.border_margin, f.fast_arc_length
                )
            )(jax.vmap(color.bgr2gray)(fr))
        )
        timeit("fast+topk", lambda: det(dwin))
    elif stage == "match":
        feat = jax.jit(lambda fr: S._extract_features_batch(jax.vmap(color.bgr2gray)(fr), cfg))
        kps, descs, valids = jax.block_until_ready(feat(dwin))
        rc = cfg.ransac
        key = jax.random.PRNGKey(0)

        @jax.jit
        def pairs(kps, descs, valids):
            kp_prev = jnp.concatenate([kps[:1], kps[:-1]], axis=0)
            desc_prev = jnp.concatenate([descs[:1], descs[:-1]], axis=0)
            valid_prev = jnp.concatenate([valids[:1], valids[:-1]], axis=0)

            def pair_fn(kq, dq, vq, kt, dt, vt, pair_key):
                mm = S._match_pair(dq, vq, dt, vt, cfg)
                src, dst, mvalid = match_ops.gather_correspondences(kq, kt, mm)
                res = geo.ransac_homography(
                    src, dst, mvalid, pair_key,
                    num_hypotheses=rc.num_hypotheses,
                    reproj_threshold=rc.reproj_threshold,
                    refine_iterations=rc.refine_iterations,
                    min_matches=rc.min_matches,
                )
                return res.H, res.num_inliers

            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(16))
            return jax.vmap(pair_fn)(kps, descs, valids, kp_prev, desc_prev, valid_prev, keys)

        timeit("match+ransac", lambda: pairs(kps, descs, valids))
    elif stage == "paint":
        from rtvm_tpu.ops.pallas_warp import warp_two_pass_pallas

        frames_cm = jnp.moveaxis(dwin.astype(jnp.float32), -1, 1)
        Hs = jnp.tile(
            jnp.asarray(
                np.array([[1.0, 0.01, 30.0], [-0.01, 1.0, 300.0], [1e-5, -1e-5, 1.0]], np.float32)
            )[None],
            (16, 1, 1),
        )
        oks = jnp.ones((16,), bool)

        @jax.jit
        def paint(canvas, union, frames_cm, Hs, oks):
            def body(carry, xs):
                canvas, union = carry
                frame_cm, H_abs, ok_r = xs
                new_px = warp_two_pass_pallas(frame_cm, H_abs, hc, wc)
                w_new = warp_ops.analytic_frame_weight(H_abs, frame_cm.shape[1], frame_cm.shape[2], hc, wc)
                w_new = jnp.where(ok_r, w_new, 0.0)
                w_old = warp_ops.union_weight(canvas, union, hc, wc)
                canvas, _ = warp_ops._blend_cm(canvas, w_old, new_px, w_new)
                union = union | warp_ops.coarse_footprint(w_new)
                return (canvas, union), None

            (canvas, union), _ = jax.lax.scan(body, (canvas, union), (frames_cm, Hs, oks))
            return canvas, union

        c0, u0 = m.state.canvas, m.state.union_coarse
        timeit("paint16", lambda: paint(c0, u0, frames_cm, Hs, oks))
    elif stage == "full":
        step = S.get_window_step(m.frame_shape, cfg)
        st = m.state

        def run():
            s2, aux = step(st, dwin, m._key, m._fweight, m._wtable)
            return aux.num_inliers

        # donation invalidates st; rebuild per call instead: time without donation
        step_nodonate = jax.jit(S.make_window_step(m.frame_shape, cfg).__wrapped__)
        timeit("full", lambda: step_nodonate(st, dwin, m._key, m._fweight, m._wtable)[1].num_inliers)
    else:
        print(f"unknown stage {stage}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
