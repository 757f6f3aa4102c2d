"""Scan-amortized stage profiler — the only reliable timing instrument on the
axon tunnel.

Per-dispatch timing is useless here: every blocked dispatch pays a ~30 ms
tunnel round trip, and any dispatch longer than ~300 ms trips the duty-cycle
throttle mid-flight (NOTES_ROUND2.md item 10). So each stage is timed as a
`lax.scan` of R repetitions inside ONE dispatch sized under the throttle
budget; the RTT amortizes over R and the per-rep time is honest device time.
A carry-dependent perturbation (runtime-zero, not provably zero) feeds each
rep so XLA cannot hoist the loop-invariant stage out of the scan.

Stages are cumulative prefixes of the SIFT window step; attribute costs by
differencing successive rows.

    python tools/profile_fused.py [R] [detector]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"


def main(R=4, detector="sift"):
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
    win = int(os.environ.get("PROFILE_WINDOW", "16"))
    frames = np.stack([cap.read()[1] for _ in range(win)])
    cap.release()
    m = S.VideMosaic(f0, detector_type=detector, config=MosaicConfig(window_size=win))
    cfg = m.config
    f = cfg.features
    int(jnp.int32(0))
    dwin = jnp.asarray(frames)
    grays = jax.jit(lambda fr: jax.vmap(color.bgr2gray)(fr))(dwin)
    jax.block_until_ready(grays)

    def checksum(out):
        leaves = [l for l in jax.tree_util.tree_leaves(out) if hasattr(l, "dtype")]
        return sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)

    only = os.environ.get("PROFILE_STAGES", "")

    def timed(name, stage, x, reps=R):
        """stage: f32-pytree -> pytree. Times R serial reps in one dispatch.
        PROFILE_STAGES=substr,substr limits which stages run."""
        if only and not any(f in name for f in only.split(",")):
            return None

        def body(c, _):
            # runtime-zero, not provably-zero perturbation -> no hoisting
            eps = (c * 1e-30).astype(jnp.float32)

            def perturb(a):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    return a + eps.astype(a.dtype)
                if a.dtype == jnp.bool_:
                    return a ^ (eps != 0)
                return a + (eps != 0).astype(a.dtype)

            out = stage(jax.tree_util.tree_map(perturb, x))
            return checksum(out), None

        fn = jax.jit(lambda c: jax.lax.scan(body, c, None, length=reps)[0])
        jax.block_until_ready(fn(jnp.float32(0.0)))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(jnp.float32(0.0)))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - 0.030) / reps  # subtract one RTT for the dispatch itself
        print(f"{name:24s} {per*1e3:8.2f} ms/window ({per*1e3/win:6.3f} ms/frame)  "
              f"[dispatch {min(ts)*1e3:.0f} ms / {reps} reps]", flush=True)
        return per

    # ---- cumulative prefixes of the SIFT feature path ----
    s = f.sift_scales
    sigma0 = f.sift_sigma
    kfac = 2.0 ** (1.0 / s)
    sigmas = np.array([sigma0 * kfac ** l for l in range(s + 3)], dtype=np.float32)
    deltas = np.sqrt(np.maximum(sigmas ** 2 - sigmas[0] ** 2, 0.0))

    from rtvm_tpu.ops.filters import gaussian_blur

    def pyramid_one(gray):
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            outs.append(gauss)
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def detect_one(gray):
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        quotas = SF._octave_quotas(f.max_keypoints, f.sift_octaves)
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            dogs = gauss[1:] - gauss[:-1]
            outs.append(SF._detect_octave(dogs, quotas[o], f.sift_contrast_threshold,
                                          10.0, f.border_margin))
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def extrema_one(gray):
        """Pyramid + extrema masks only (no Hessian edge test, no top-k)."""
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            dogs = gauss[1:] - gauss[:-1]
            mid = dogs[1:-1]
            pmax, pmin = SF.minmaxpool3x3(dogs)
            is_max = (mid >= pmax[:-2]) & (mid >= pmax[2:]) & (mid >= pmax[1:-1] - 1e-12) & (mid > 0)
            is_min = (mid <= pmin[:-2]) & (mid <= pmin[2:]) & (mid <= pmin[1:-1] + 1e-12) & (mid < 0)
            score = jnp.abs(mid)
            outs.append(jnp.where((is_max | is_min) & (score > f.sift_contrast_threshold), score, 0.0))
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def hessian_one(gray):
        """Pyramid + extrema + Hessian edge gate (no top-k / refinement)."""
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            dogs = gauss[1:] - gauss[:-1]
            mid = dogs[1:-1]
            pmax, pmin = SF.minmaxpool3x3(dogs)
            is_max = (mid >= pmax[:-2]) & (mid >= pmax[2:]) & (mid >= pmax[1:-1] - 1e-12) & (mid > 0)
            is_min = (mid <= pmin[:-2]) & (mid <= pmin[2:]) & (mid <= pmin[1:-1] + 1e-12) & (mid < 0)
            score = jnp.abs(mid)
            extremum = (is_max | is_min) & (score > f.sift_contrast_threshold)
            dxx = jnp.roll(mid, -1, 2) + jnp.roll(mid, 1, 2) - 2 * mid
            dyy = jnp.roll(mid, -1, 1) + jnp.roll(mid, 1, 1) - 2 * mid
            dxy = 0.25 * (
                jnp.roll(jnp.roll(mid, -1, 1), -1, 2) + jnp.roll(jnp.roll(mid, 1, 1), 1, 2)
                - jnp.roll(jnp.roll(mid, -1, 1), 1, 2) - jnp.roll(jnp.roll(mid, 1, 1), -1, 2)
            )
            tr = dxx + dyy
            det = dxx * dyy - dxy * dxy
            edge_ok = (det > 0) & (tr * tr * 10.0 < 11.0 ** 2 * det)
            outs.append(jnp.where(extremum & edge_ok, score, 0.0))
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def inter_one(gray):
        """Pyramid + the patch extractor's interleave relayout only (no
        per-keypoint slices) — isolates the transpose cost."""
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        I = SF.INTERLEAVE
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            gm = jax.lax.optimization_barrier(gauss[1:s + 1])
            ss, h, w = gm.shape
            wp = ((w + 127) // 128) * 128
            big = jnp.pad(gm, ((0, 0), (0, 0), (0, wp - w))).reshape(ss * h, wp)
            big = jnp.pad(big, ((0, (-big.shape[0]) % I + I), (0, 0)))
            ri = big.shape[0] // I
            outs.append(big.reshape(ri, I, wp).transpose(0, 2, 1).reshape(ri, I * wp))
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def patches_one(gray):
        img = gray / 255.0
        base = gaussian_blur(img, float(np.sqrt(max(sigma0 ** 2 - 0.25, 0.01))))
        quotas = SF._octave_quotas(f.max_keypoints, f.sift_octaves)
        outs = []
        for o in range(f.sift_octaves):
            gauss = SF._octave_levels(base, deltas)
            dogs = gauss[1:] - gauss[:-1]
            xy, lvl, _, valid = SF._detect_octave(dogs, quotas[o], f.sift_contrast_threshold,
                                                  10.0, f.border_margin)
            outs.append(SF._extract_patches_tiered(gauss[1:s + 1], xy, lvl))
            if o + 1 < f.sift_octaves:
                base = gauss[s][::2, ::2]
        return outs

    def ingest_stage(fr):
        """uint8 window -> (channel-major f32 frames, grays): the step's input
        conversion + lane-crossing transpose, absent from every other stage."""
        u8 = fr.astype(jnp.uint8)
        cm = jnp.moveaxis(u8.astype(jnp.float32), -1, 1)
        return cm, jax.vmap(color.bgr2gray)(u8)

    timed("gray", lambda fr: jax.vmap(color.bgr2gray)(fr), dwin.astype(jnp.float32), reps=3 * R)
    timed("ingest(u8->cm+gray)", ingest_stage, dwin.astype(jnp.float32), reps=2 * R)
    timed("pyramid", lambda g: jax.vmap(pyramid_one)(g), grays, reps=2 * R)
    timed("pyr+extrema", lambda g: jax.vmap(extrema_one)(g), grays, reps=R)
    timed("pyr+ext+hessian", lambda g: jax.vmap(hessian_one)(g), grays, reps=R)
    timed("pyr+detect", lambda g: jax.vmap(detect_one)(g), grays, reps=R)
    timed("pyr+inter", lambda g: jax.vmap(inter_one)(g), grays, reps=R)
    timed("pyr+det+patches", lambda g: jax.vmap(patches_one)(g), grays, reps=R)
    timed("features(all)", lambda g: jax.vmap(lambda x: SF.detect_and_describe(x, f))(g),
          grays, reps=R)

    kp, desc, valid = jax.jit(lambda g: jax.vmap(lambda x: SF.detect_and_describe(x, f))(g))(grays)
    jax.block_until_ready(desc)

    def match_stage(d):
        return jax.vmap(lambda dq, vq, dt, vt: S._match_pair(dq, vq, dt, vt, cfg))(
            d[1:], valid[1:], d[:-1], valid[:-1])

    timed("match(15 pairs)", match_stage, desc, reps=R)

    from rtvm_tpu.geometry import homography as GEO
    from rtvm_tpu.ops import match as MOPS

    rc = cfg.ransac

    def ransac_stage(x):
        d, kpx = x

        def pair(kq, dq, vq, kt, dt, vt, i):
            mm = S._match_pair(dq, vq, dt, vt, cfg)
            srcp, dstp, mv = MOPS.gather_correspondences(kq, kt, mm)
            res = GEO.ransac_homography(
                srcp, dstp, mv, jax.random.fold_in(m._key, i),
                num_hypotheses=rc.num_hypotheses,
                reproj_threshold=rc.reproj_threshold,
                refine_iterations=rc.refine_iterations,
                min_matches=rc.min_matches,
            )
            return res.H, res.num_inliers

        return jax.vmap(pair)(
            kpx[1:], d[1:], valid[1:], kpx[:-1], d[:-1], valid[:-1],
            jnp.arange(15),
        )

    timed("match+ransac(15)", ransac_stage, (desc, kp), reps=R)

    # ---- paint path (warp + weights + blend into the canvas) ----
    from rtvm_tpu.ops import warp as W

    hc, wc = m.canvas_shape[0], m.canvas_shape[1]
    hf, wf = m.frame_shape[0], m.frame_shape[1]
    # translation-only H chain (~3 px/frame pan) — inside every warp regime
    H_np = np.tile(np.eye(3, dtype=np.float32), (win, 1, 1))
    H_np[:, 0, 2] = m.h_offset + 3.0 * np.arange(win)
    H_np[:, 1, 2] = m.w_offset - 1.0 * np.arange(win)
    H_seq = jnp.asarray(H_np)
    frames_cm0 = jnp.moveaxis(dwin.astype(jnp.float32), -1, 1)  # [B, 3, H, W]

    def fwp_of(Hs):
        return jax.vmap(lambda Hh: W.frame_weight_params(Hh, hf, wf, hc, wc))(Hs)

    def paint_with(warp_fn):
        def stage(x):
            canvas, union, fcm, Hs = x
            fwp = fwp_of(Hs)

            def body(carry, xs):
                canvas, union = carry
                f_cm, H_abs, fw = xs
                new_px = warp_fn(f_cm, H_abs)
                w_new = W.frame_weight_with_holes(new_px, W.frame_weight_eval(fw, hc, wc))
                w_old = W.union_weight(canvas, union, hc, wc)
                canvas, _ = W._blend_cm(canvas, w_old, new_px, w_new)
                union = union | W.coarse_footprint(w_new)
                return (canvas, union), None

            (canvas, union), _ = jax.lax.scan(body, (canvas, union), (fcm, Hs, fwp))
            return canvas

        return stage

    def warp_only(warp_fn):
        def stage(x):
            canvas, fcm, Hs = x

            def body(c, xs):
                f_cm, H_abs = xs
                return c + 1e-6 * warp_fn(f_cm, H_abs), None

            return jax.lax.scan(body, canvas, (fcm, Hs))[0]

        return stage

    def weights_only(x):
        canvas, union, Hs = x
        fwp = fwp_of(Hs)

        def body(c, xs):
            fw = xs
            w_new = W.frame_weight_eval(fw, hc, wc)
            w_old = W.union_weight(c, union, hc, wc)
            return c + 1e-6 * (w_new + w_old)[None], None

        return jax.lax.scan(body, canvas, fwp)[0]

    def paint_batched(warp_fn):
        """Round-4 structure: warp + weight construction batched over the
        window (vmap), only the blend recurrence in the scan — mirrors the
        production stitcher paint_scan."""

        def stage(x):
            canvas, union, fcm, Hs = x
            fwp = fwp_of(Hs)
            new_seq = jax.vmap(warp_fn)(fcm, Hs)
            wq_seq = jax.vmap(lambda fw: W.frame_weight_eval(fw, hc, wc))(fwp)
            wnew_seq = jax.vmap(W.frame_weight_with_holes)(new_seq, wq_seq)
            foot_seq = jax.vmap(W.coarse_footprint)(wnew_seq)

            def body(carry, xs):
                canvas, union = carry
                new_px, w_new, foot = xs
                w_old = W.union_weight(canvas, union, hc, wc)
                canvas, _ = W._blend_cm(canvas, w_old, new_px, w_new)
                return (canvas, union | foot), None

            (canvas, union), _ = jax.lax.scan(
                body, (canvas, union), (new_seq, wnew_seq, foot_seq)
            )
            return canvas

        return stage

    def prescan_stage(x):
        """The 3x3 compose/validate/smooth scan + regime checks alone."""
        Hs = x

        def body(carry, H_rel):
            H_old, hbuf, hcount = carry
            ok = GEO.validate_homography(H_rel, 50.0, 0.3, 1e-3)
            H_v = jnp.where(ok, H_rel, GEO.EYE3)
            hbuf2, hcount2, H_s = GEO.smooth_homography_step(hbuf, hcount, H_v, m._wtable)
            H_abs = jnp.matmul(H_old, H_s, precision=jax.lax.Precision.HIGHEST)
            tp = W.two_pass_regime_ok(H_abs, hc, wc)
            pl = W.pallas_regime_ok(H_abs, hc, wc, hf, wf)
            return (H_abs, hbuf2, hcount2), (H_abs, tp, pl)

        hbuf0 = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (5, 1, 1))
        (_, _, _), outs = jax.lax.scan(body, (Hs[0], hbuf0, jnp.int32(0)), Hs)
        return outs

    paint_x = (m.state.canvas, m.state.union_coarse, frames_cm0, H_seq)
    timed("prescan(compose)", prescan_stage, H_seq, reps=2 * R)
    timed("paint(two_pass)", paint_with(lambda f, h: W.warp_two_pass(f, h, hc, wc)),
          paint_x, reps=R)
    timed("warp(two_pass)", warp_only(lambda f, h: W.warp_two_pass(f, h, hc, wc)),
          (m.state.canvas, frames_cm0, H_seq), reps=R)
    timed("weights(frame+union)", weights_only,
          (m.state.canvas, m.state.union_coarse, H_seq), reps=R)
    if jax.default_backend() == "tpu":
        from rtvm_tpu.ops.pallas_warp import warp_two_pass_pallas

        timed("paint(pallas)", paint_with(lambda f, h: warp_two_pass_pallas(f, h, hc, wc)),
              paint_x, reps=R)
        timed("paint(batched-pallas)",
              paint_batched(lambda f, h: warp_two_pass_pallas(f, h, hc, wc)),
              paint_x, reps=R)
        timed("warp(pallas)", warp_only(lambda f, h: warp_two_pass_pallas(f, h, hc, wc)),
              (m.state.canvas, frames_cm0, H_seq), reps=R)

    body = S.make_step_body(m.frame_shape, cfg)

    def step_stage(x):
        fr, st = x
        st2, aux = body(st, fr.astype(jnp.uint8), m._key, m._fweight, m._wtable)
        return st2.canvas, aux.num_inliers

    timed("full step", step_stage, (dwin.astype(jnp.float32), m.state), reps=R)

    if os.environ.get("PROFILE_YOLO", "1") == "1":
        from rtvm_tpu.detect.detector import ObjectDetector

        det = ObjectDetector(model="yolov8n")
        run = det._infer_fn((384, 640), 0.25, 0.45)

        def yolo_stage(fr):
            out = run(fr.astype(jnp.uint8))
            return out.boxes, out.scores

        timed("yolov8n(16@384x640)", yolo_stage, dwin.astype(jnp.float32), reps=R)


if __name__ == "__main__":
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    det = sys.argv[2] if len(sys.argv) > 2 else "sift"
    main(r, det)
