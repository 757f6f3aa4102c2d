"""Diagnose the mosaic PSNR gap vs the OpenCV oracle by isolating error sources:

  A. single-frame warp: two-pass MXU warp vs cv2.warpPerspective (interpolant+bf16)
  B. single-frame warp: our gather warp vs cv2 (sanity: both direct bilinear)
  C. full pipeline with OUR warps + EXACT weights (cv2 distance transforms)
     vs oracle  -> isolates the warp contribution in the full mosaic
  D. full pipeline with CV2 warps + OUR coarse-chamfer weights vs oracle
     -> isolates the weight contribution

Run: env JAX_PLATFORMS=cpu python tools/psnr_decompose.py [n_frames]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"


def psnr(a, b, mask):
    d = (a - b)[mask]
    mse = float((d**2).mean()) if d.size else 0.0
    return 10.0 * np.log10(255.0**2 / max(mse, 1e-12))


def main(n_frames=32, window=16):
    import cv2
    import jax
    import jax.numpy as jnp

    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.mosaic.stitcher import VideMosaic
    from rtvm_tpu.ops import warp as W

    cap = cv2.VideoCapture(VIDEO)
    _, f0 = cap.read()
    frames = []
    while len(frames) < n_frames:
        ok, fr = cap.read()
        if not ok:
            break
        frames.append(fr)
    cap.release()
    n_frames = (len(frames) // window) * window
    frames = frames[:n_frames]

    cfg = MosaicConfig(window_size=window)
    m = VideMosaic(f0, detector_type="orb", config=cfg)
    hs, used = [], []
    for i in range(0, n_frames, window):
        aux = m.process_window(np.stack(frames[i : i + window]))
        h_abs, bl = np.asarray(aux.H_abs), np.asarray(aux.blended)
        for j in range(window):
            if bl[j]:
                hs.append(h_abs[j])
                used.append(frames[i + j])
    ours = m.output_img
    hc, wc = ours.shape[:2]
    h, w = f0.shape[:2]
    print(f"frames={n_frames} blended={len(used)} canvas={hc}x{wc}")

    # ---- A/B: single-frame warp fidelity over the clip's real H range ----
    tp_psnrs, ga_psnrs, regime = [], [], []
    warp2 = jax.jit(lambda fcm, H: W.warp_two_pass(fcm, H, hc, wc))
    warpg = jax.jit(lambda fcm, H: W._warp_gather_cm(fcm, H, hc, wc))
    for idx in range(0, len(used), max(1, len(used) // 8)):
        fr, H = used[idx].astype(np.float32), hs[idx]
        ref = cv2.warpPerspective(fr, H.astype(np.float64), (wc, hc))
        mask = (ref.sum(-1) > 0)
        mask &= np.roll(mask, 3, 0) & np.roll(mask, -3, 0) & np.roll(mask, 3, 1) & np.roll(mask, -3, 1)
        fcm = jnp.moveaxis(jnp.asarray(fr), -1, 0)
        Hj = jnp.asarray(H, jnp.float32)
        tp = np.moveaxis(np.asarray(warp2(fcm, Hj)), 0, -1)
        ga = np.moveaxis(np.asarray(warpg(fcm, Hj)), 0, -1)
        tp_psnrs.append(psnr(tp, ref, mask))
        ga_psnrs.append(psnr(ga, ref, mask))
        regime.append(bool(W.two_pass_regime_ok(Hj, hc, wc)))
    print(f"A. two-pass vs cv2 single-warp PSNR: {np.min(tp_psnrs):.1f}..{np.max(tp_psnrs):.1f} dB (median {np.median(tp_psnrs):.1f}) regime_ok={all(regime)}")
    print(f"B. gather   vs cv2 single-warp PSNR: {np.min(ga_psnrs):.1f}..{np.max(ga_psnrs):.1f} dB (median {np.median(ga_psnrs):.1f})")

    # ---- oracle (cv2 warps + exact weights) ----
    def build(warp_fn, weight_mode):
        out = np.zeros((hc, wc, 3), np.float32)
        out[m.w_offset : m.w_offset + h, m.h_offset : m.h_offset + w] = f0
        cell = W.CELL_PX
        union = np.zeros((-(-hc // cell), -(-wc // cell)), bool)
        fp0 = np.zeros((hc, wc), np.float32)
        fp0[m.w_offset : m.w_offset + h, m.h_offset : m.h_offset + w] = 1.0
        union |= np.asarray(W.coarse_footprint(jnp.asarray(fp0)))
        for fr, H in zip(used, hs):
            warped = warp_fn(fr.astype(np.float32), H)
            mask_new = (warped.sum(-1) > 0).astype(np.uint8)
            mask_old = (out.sum(-1) > 0).astype(np.uint8)
            if weight_mode == "exact":
                dn = cv2.distanceTransform(mask_new * 255, cv2.DIST_L2, 3)
                do = cv2.distanceTransform(mask_old * 255, cv2.DIST_L2, 3)
            else:  # ours: analytic new + coarse chamfer old
                dn = np.asarray(W.analytic_frame_weight(jnp.asarray(H, jnp.float32), h, w, hc, wc))
                do = np.asarray(W.upsample_weight(W.coarse_union_distance(jnp.asarray(union)), hc, wc))
            alpha = dn / (dn + do + 1e-6)
            blended = alpha[..., None] * warped + (1 - alpha[..., None]) * out
            overlap = (mask_new & mask_old) > 0
            out = np.where(overlap[..., None], blended, np.where(mask_new[..., None] > 0, warped, out))
            union |= np.asarray(W.coarse_footprint(jnp.asarray(dn if weight_mode != "exact" else mask_new.astype(np.float32))))
        return np.clip(out, 0, 255)

    def cv2w(fr, H):
        return cv2.warpPerspective(fr, H.astype(np.float64), (wc, hc))

    def oursw(fr, H):
        fcm = jnp.moveaxis(jnp.asarray(fr), -1, 0)
        Hj = jnp.asarray(H, jnp.float32)
        out = warp2(fcm, Hj) if bool(W.two_pass_regime_ok(Hj, hc, wc)) else warpg(fcm, Hj)
        return np.moveaxis(np.asarray(out), 0, -1)

    oracle = build(cv2w, "exact")
    mask = (oracle.sum(-1) > 0) & (ours.sum(-1) > 0)
    for sh in (4, -4):
        mask &= np.roll(mask, sh, 0) & np.roll(mask, sh, 1)

    print(f"0. full TPU pipeline vs oracle:      {psnr(np.asarray(ours), oracle, mask):.2f} dB")
    hybrid_c = build(oursw, "exact")
    print(f"C. our warps + exact weights:        {psnr(hybrid_c, oracle, mask):.2f} dB (warp contribution)")
    hybrid_d = build(cv2w, "ours")
    print(f"D. cv2 warps + our coarse weights:   {psnr(hybrid_d, oracle, mask):.2f} dB (weight contribution)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)
