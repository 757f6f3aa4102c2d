"""Ablation profiling of the mosaic window step on TPU.

The tunnel's duty-cycle throttle makes absolute per-op timings unreliable, so
stage costs are measured differentially: compile a window-step variant with one
stage disabled, time it the same way as the full step in the same process
burst, and attribute the difference. Usage:

    python tools/profile_ablate.py <variant>
    variants: full, no_features, no_match, no_warp, no_edt, no_blendall
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(variant, cfg, m, hc, wc):
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.geometry import homography as geo
    from rtvm_tpu.mosaic import stitcher as S
    from rtvm_tpu.ops import color, warp as warp_ops
    from rtvm_tpu.ops import match as match_ops

    st = cfg.stabilization
    rc = cfg.ransac

    def step(state, frames, base_key, fweight, weight_table):
        b = frames.shape[0]
        frames_cm = jnp.moveaxis(frames.astype(jnp.float32), -1, 1)

        if variant == "no_features":
            k = state.kp.shape[0]
            kps = jnp.broadcast_to(state.kp, (b,) + state.kp.shape)
            descs = jnp.broadcast_to(state.desc, (b,) + state.desc.shape)
            valids = jnp.broadcast_to(state.kp_valid, (b,) + state.kp_valid.shape)
        else:
            (kps, descs, valids) = jax.vmap(
                lambda f: S._extract_features(color.bgr2gray(f), cfg)
            )(frames)

        if variant == "skeleton":
            # scan + transposes only: no features, no match, no warp, no blend
            def body0(carry, xs):
                canvas, union, H_old, hbuf, hcount = carry
                frame_cm, = xs
                H_abs = H_old @ jnp.eye(3, dtype=jnp.float32)
                canvas = canvas + frame_cm[0, 0, 0] * 1e-12
                return (canvas, union, H_abs, hbuf, hcount), H_abs[0, 0]

            carry0 = (state.canvas, state.union_coarse, state.H_old, state.hbuf, state.hcount)
            (canvas, union, H_old, hbuf, hcount), _ = jax.lax.scan(body0, carry0, (frames_cm,))
            return state._replace(canvas=canvas, union_coarse=union, H_old=H_old), None

        kp_prev = jnp.concatenate([state.kp[None], kps[:-1]], axis=0)
        desc_prev = jnp.concatenate([state.desc[None], descs[:-1]], axis=0)
        valid_prev = jnp.concatenate([state.kp_valid[None], valids[:-1]], axis=0)

        if variant == "no_match":
            H_rels = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
            r_ok = jnp.ones((b,), bool)
        elif variant == "no_ransac":
            # matching + correspondence gather, but skip the RANSAC solve stack
            def pair_fn2(kq, dq, vq, kt, dt, vt):
                mm = match_ops.match_hamming_crosscheck(dq, vq, dt, vt)
                src, dst, mvalid = match_ops.gather_correspondences(kq, kt, mm)
                h = jnp.eye(3, dtype=jnp.float32)
                h = h.at[0, 2].add(jnp.sum(jnp.where(mvalid[:, None], dst - src, 0.0)) * 1e-12)
                return h, jnp.ones((), bool)

            H_rels, r_ok = jax.vmap(pair_fn2)(kps, descs, valids, kp_prev, desc_prev, valid_prev)
        elif variant == "no_refine":
            def pair_fn3(kq, dq, vq, kt, dt, vt, pair_key):
                mm = match_ops.match_hamming_crosscheck(dq, vq, dt, vt)
                src, dst, mvalid = match_ops.gather_correspondences(kq, kt, mm)
                res = geo.ransac_homography(
                    src, dst, mvalid, pair_key,
                    num_hypotheses=rc.num_hypotheses,
                    reproj_threshold=rc.reproj_threshold,
                    refine_iterations=0,
                    min_matches=rc.min_matches,
                )
                return res.H, res.ok

            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                state.frame_idx + jnp.arange(b)
            )
            H_rels, r_ok = jax.vmap(pair_fn3)(kps, descs, valids, kp_prev, desc_prev, valid_prev, keys)
        else:
            def pair_fn(kq, dq, vq, kt, dt, vt, pair_key):
                mm = match_ops.match_hamming_crosscheck(dq, vq, dt, vt)
                src, dst, mvalid = match_ops.gather_correspondences(kq, kt, mm)
                res = geo.ransac_homography(
                    src, dst, mvalid, pair_key,
                    num_hypotheses=rc.num_hypotheses,
                    reproj_threshold=rc.reproj_threshold,
                    refine_iterations=rc.refine_iterations,
                    min_matches=rc.min_matches,
                )
                return res.H, res.ok

            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
                state.frame_idx + jnp.arange(b)
            )
            H_rels, r_ok = jax.vmap(pair_fn)(kps, descs, valids, kp_prev, desc_prev, valid_prev, keys)

        def body(carry, xs):
            canvas, union, H_old, hbuf, hcount = carry
            frame_cm, H_rel, ok_r = xs
            ok = ok_r & geo.validate_homography(
                H_rel, st.translation_threshold, st.scale_threshold, st.perspective_threshold
            )
            H_v = jnp.where(ok, H_rel, geo.EYE3)
            hbuf2, hcount2, H_s = geo.smooth_homography_step(hbuf, hcount, H_v, weight_table)
            H_abs = H_old @ H_s
            if variant in ("no_warp", "no_blendall"):
                new_px = jnp.zeros_like(canvas) + frame_cm[:, 0, 0][:, None, None] * 1e-12
                w_new = jnp.zeros((hc, wc), jnp.float32) + H_abs[2, 2] * 1e-12
            else:
                new_px, w_new = warp_ops.warp_frame_cm(frame_cm, fweight, H_abs, hc, wc)
            if variant in ("no_edt", "no_blendall"):
                w_old = jnp.ones((hc, wc), jnp.float32)
            else:
                w_old = warp_ops.union_weight(canvas, union, hc, wc)
            if variant == "no_blendall":
                canvas = canvas + new_px * 1e-12 + w_old[None] * 0
            else:
                canvas, _ = warp_ops._blend_cm(canvas, w_old, new_px, w_new)
                union = union | warp_ops.coarse_footprint(w_new)
            return (canvas, union, H_abs, hbuf2, hcount2), ok

        carry0 = (state.canvas, state.union_coarse, state.H_old, state.hbuf, state.hcount)
        (canvas, union, H_old, hbuf, hcount), oks = jax.lax.scan(
            body, carry0, (frames_cm, H_rels, r_ok)
        )
        return state._replace(canvas=canvas, union_coarse=union, H_old=H_old), oks

    return jax.jit(step, donate_argnums=(0,))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic import stitcher as S

    VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = np.stack([cap.read()[1] for _ in range(16)])
    cap.release()
    m = S.VideMosaic(f0, detector_type="orb", config=MosaicConfig(window_size=16))
    cfg = m.config
    hc, wc = m.canvas_shape[:2]
    int(jnp.int32(0))

    step = build_step(variant, cfg, m, hc, wc)
    dwin = jnp.asarray(frames)
    state = m.state
    state, _ = step(state, dwin, m._key, m._fweight, m._wtable)  # compile+run
    jax.block_until_ready(state.canvas)
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, _ = step(state, dwin, m._key, m._fweight, m._wtable)
        jax.block_until_ready(state.canvas)
        ts.append(time.perf_counter() - t0)
    print(f"{variant:14s} min {min(ts)*1000:7.1f} ms  all {[round(t*1000,1) for t in ts]}")


if __name__ == "__main__":
    main()
