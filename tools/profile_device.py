"""RTT-corrected device timing of production window-step stages.

The axon tunnel adds a ~27-38 ms round-trip to every blocked dispatch, and
latches into a ~22% duty cycle if >~4 steps are queued back-to-back
(NOTES_ROUND1.md items 1/5). True device time is therefore estimated as
    median(t_stage_blocked) - median(t_tiny_blocked)
measured interleaved in the same process burst. Usage:

    python tools/profile_device.py <stage>
    stages: full, features, score, topk, match, ransac, paint
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(stage):
    import jax

    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()
    import cv2
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.geometry import homography as geo
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color, match as match_ops, warp as warp_ops

    VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    cfg = MosaicConfig(window_size=16)
    m = S.VideMosaic(f0, detector_type="orb", config=cfg)
    cfg = m.config
    int(jnp.int32(0))
    dwin = jnp.asarray(frames)
    hc, wc = m.canvas_shape[:2]

    tiny = jax.jit(lambda x: x + 1)
    tx = jnp.ones((8, 128), jnp.float32)
    jax.block_until_ready(tiny(tx))

    def measure(name, fn, reps=7):
        jax.block_until_ready(fn())
        jax.block_until_ready(fn())
        ts, rtts = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append((time.perf_counter() - t0) * 1e3)
            t0 = time.perf_counter()
            jax.block_until_ready(tiny(tx))
            rtts.append((time.perf_counter() - t0) * 1e3)
        dev = np.median(ts) - np.median(rtts)
        print(
            f"{name:12s} device ~{dev:6.1f} ms  (blocked med {np.median(ts):.1f}, rtt med {np.median(rtts):.1f})"
        )
        return dev

    if stage == "full":
        step = S.get_window_step(m.frame_shape, cfg)
        st0 = m.state

        def run():
            st, aux = step(st0, dwin, m._key, m._fweight, m._wtable)
            return aux.num_inliers

        # donation would invalidate st0; rebuild a non-donating jit
        step_nd = jax.jit(S.make_window_step(m.frame_shape, cfg).__wrapped__)
        measure("full", lambda: step_nd(st0, dwin, m._key, m._fweight, m._wtable)[1].num_inliers)
    elif stage == "features":
        feat = jax.jit(lambda fr: S._extract_features_batch(jax.vmap(color.bgr2gray)(fr), cfg))
        measure("features", lambda: feat(dwin))
    elif stage == "score":
        from rtvm_tpu.ops.features import fast as F

        grays = jax.block_until_ready(jax.jit(jax.vmap(color.bgr2gray))(dwin))
        fn = jax.jit(jax.vmap(lambda g: F.fast_score_map(g, 20.0, 9)))
        measure("score_map", lambda: fn(grays))
    elif stage == "topk":
        blocks = jnp.asarray(
            np.random.RandomState(0).randint(0, 1 << 30, (16, 360 * 80)).astype(np.int32)
        )
        fn = jax.jit(jax.vmap(lambda b: jax.lax.top_k(b, 700)[0]))
        measure("topk", lambda: fn(blocks))
    elif stage in ("match", "ransac"):
        feat = jax.jit(lambda fr: S._extract_features_batch(jax.vmap(color.bgr2gray)(fr), cfg))
        kps, descs, valids = jax.block_until_ready(feat(dwin))
        rc = cfg.ransac
        key = jax.random.PRNGKey(0)
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(16))

        @jax.jit
        def match_only(descs, valids):
            desc_prev = jnp.concatenate([descs[:1], descs[:-1]], axis=0)
            valid_prev = jnp.concatenate([valids[:1], valids[:-1]], axis=0)
            return jax.vmap(lambda dq, vq, dt, vt: S._match_pair(dq, vq, dt, vt, cfg).train_idx)(
                descs, valids, desc_prev, valid_prev
            )

        @jax.jit
        def full_pairs(kps, descs, valids, keys):
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

            return jax.vmap(pair_fn)(kps, descs, valids, kp_prev, desc_prev, valid_prev, keys)

        if stage == "match":
            measure("match_only", lambda: match_only(descs, valids))
        else:
            measure("match+ransac", lambda: full_pairs(kps, descs, valids, keys))
    elif stage == "paint":
        from rtvm_tpu.ops.pallas_warp import warp_two_pass_pallas

        frames_cm = jnp.moveaxis(dwin.astype(jnp.float32), -1, 1)
        Hs = jnp.tile(
            jnp.asarray(
                np.array(
                    [[1.0, 0.01, 30.0], [-0.01, 1.0, 300.0], [1e-5, -1e-5, 1.0]], np.float32
                )
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
                w_new = warp_ops.analytic_frame_weight(
                    H_abs, frame_cm.shape[1], frame_cm.shape[2], hc, wc
                )
                w_new = jnp.where(ok_r, w_new, 0.0)
                w_old = warp_ops.union_weight(canvas, union, hc, wc)
                canvas, _ = warp_ops._blend_cm(canvas, w_old, new_px, w_new)
                union = union | warp_ops.coarse_footprint(w_new)
                return (canvas, union), None

            (canvas, union), _ = jax.lax.scan(body, (canvas, union), (frames_cm, Hs, oks))
            return canvas, union

        c0, u0 = m.state.canvas, m.state.union_coarse
        measure("paint16", lambda: paint(c0, u0, frames_cm, Hs, oks))
    else:
        print(f"unknown stage {stage}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "full")
