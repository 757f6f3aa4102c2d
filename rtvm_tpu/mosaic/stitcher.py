"""The streaming mosaic stitcher — TPU-native rebuild of the reference VideMosaic
(reference main.py:15-977).

Design (vs the reference's per-frame OpenCV calls):

- Frames are processed in fixed-size *windows*. One jitted call per window runs:
    1. batched grayscale + FAST detection + rBRIEF description for all B frames (vmap —
       feature extraction has no inter-frame dependency);
    2. batched descriptor matching + RANSAC homography for the B consecutive pairs
       (vmap — each pair only needs the two frames' features);
    3. a `lax.scan` over the window for the inherently sequential part: validate ->
       smooth -> compose H = H_old @ H_rel -> fused warp+blend into the carried canvas.
  This keeps the MXU/VPU busy on the parallel axes while paying the sequential
  dependency only where it truly exists (3x3 matrix chain + canvas writes).

- All shapes are static: K=700 keypoints with validity masks, 512 RANSAC hypotheses,
  fixed canvas. State lives on-device in HBM and is donated between steps.

- Public API mirrors the reference: VideMosaic(first_image, output_height_times,
  output_width_times, detector_type), process_frame(frame, idx), .output_img,
  plus the windowed fast path process_window(frames).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtvm_tpu.config import MosaicConfig
from rtvm_tpu.geometry import homography as geo
from rtvm_tpu.ops import color
from rtvm_tpu.ops.features import fast as fast_ops
from rtvm_tpu.ops.features import orb as orb_ops
from rtvm_tpu.ops.features import sift as sift_ops
from rtvm_tpu.ops import match as match_ops
from rtvm_tpu.ops import warp as warp_ops


class MosaicState(NamedTuple):
    """Full resumable pipeline state (the reference's (H_old, kp_prev, des_prev,
    output_img) tuple, SURVEY.md section 5 'checkpoint/resume')."""

    canvas: jnp.ndarray  # [3, Hc, Wc] float32 (channel-major: lane dim = Wc, TPU-aligned)
    union_coarse: jnp.ndarray  # [Hc/8, Wc/8] bool — mosaic coverage at 8px cells;
    # its chamfer distance reproduces the reference's per-frame distanceTransform
    # of the growing mosaic mask (main.py:888-890) at 1/64 of the cost
    H_old: jnp.ndarray  # [3, 3] float32 frame -> canvas
    kp: jnp.ndarray  # [K, 2] float32 previous-frame keypoints
    desc: jnp.ndarray  # [K, W] packed uint32 (orb) / [K, 128] float32 (sift)
    kp_valid: jnp.ndarray  # [K] bool
    hbuf: jnp.ndarray  # [S, 3, 3] float32 relative-homography history
    hcount: jnp.ndarray  # int32 history fill count
    frame_idx: jnp.ndarray  # int32 frames processed so far (frame 0 included)


class WindowAux(NamedTuple):
    """Per-frame diagnostics from one window step."""

    num_matches: jnp.ndarray  # [B] int32
    num_inliers: jnp.ndarray  # [B] int32
    H_abs: jnp.ndarray  # [B, 3, 3] absolute homographies (frame -> canvas)
    ok: jnp.ndarray  # [B] bool homography accepted (vs identity fallback)
    blended: jnp.ndarray  # [B] bool frame was painted into the canvas (False =
    # match/RANSAC failure -> frame skipped entirely, reference main.py:722-731)
    two_pass: jnp.ndarray  # [B] bool frame used the fast two-pass MXU warp
    # (False = out-of-regime H -> exact-but-slow gather fallback)


def _extract_features_batch(grays: jnp.ndarray, cfg: MosaicConfig):
    """grays [B, H, W] -> (kp [B,K,2], desc [B,K,...], valid [B,K]).

    Batch-first: the ORB descriptor stage runs its per-keypoint DMA slices in one
    flat vmap over B*K (per-row billing — see orb.extract_patches_batch)."""
    f = cfg.features
    if f.detector_type == "orb":
        kps = jax.vmap(
            lambda g: fast_ops.detect_fast(
                g, f.max_keypoints, f.fast_threshold, f.border_margin, f.fast_arc_length
            )
        )(grays)
        desc = orb_ops.describe_orb_batch(
            grays,
            kps.xy,
            kps.valid,
            n_bits=f.brief_bits,
            pattern_radius=f.brief_patch_radius,
            blur_sigma=f.brief_blur_sigma,
            orientation_radius=f.orientation_radius,
        )
        return kps.xy, desc.bits, kps.valid
    elif f.detector_type == "sift":
        return jax.vmap(lambda g: sift_ops.detect_and_describe(g, f))(grays)
    raise ValueError(f"unknown detector_type: {f.detector_type}")


def _extract_features(gray: jnp.ndarray, cfg: MosaicConfig):
    """gray [H, W] -> (kp [K,2], desc, valid [K]) for the configured detector."""
    kp, desc, valid = _extract_features_batch(gray[None], cfg)
    return kp[0], desc[0], valid[0]


def _match_pair(desc_q, valid_q, desc_t, valid_t, cfg: MosaicConfig):
    if cfg.features.detector_type == "orb":
        return match_ops.match_hamming_crosscheck(desc_q, valid_q, desc_t, valid_t)
    return match_ops.match_l2_ratio(desc_q, valid_q, desc_t, valid_t, cfg.match.ratio)


_STEP_CACHE: dict = {}
_FEATURE_CACHE: dict = {}


def _use_pallas_warp() -> bool:
    """Pallas paint tier only on real TPU (interpret mode is far too slow for
    the CPU test backend; the XLA two-pass tier is the CPU path)."""
    import jax

    return jax.default_backend() == "tpu"


def get_feature_fn(cfg: MosaicConfig):
    if cfg not in _FEATURE_CACHE:
        _FEATURE_CACHE[cfg] = jax.jit(
            lambda f: _extract_features(color.bgr2gray(f), cfg)
        )
    return _FEATURE_CACHE[cfg]


def get_window_step(frame_shape: Tuple[int, int, int], cfg: MosaicConfig):
    """Process-global cache of jitted window steps keyed by (frame shape, config).
    Without this every VideMosaic instance would recompile the step (~25 s)."""
    key = (frame_shape, cfg)
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = make_window_step(frame_shape, cfg)
    return _STEP_CACHE[key]


def make_step_body(frame_shape: Tuple[int, int, int], cfg: MosaicConfig):
    """Build the UN-jitted window step body for a given frame shape + config
    (jit it directly via make_window_step, or scan it across many windows via
    make_clip_step for a single fused dispatch).

    Returns step(state, frames_u8 [B, H, W, 3], base_key, fweight, weight_table)
    -> (state, WindowAux).

    PERFORMANCE NOTE: every array bigger than a few elements must be a jit *argument*,
    never a Python closure constant — constants embedded in the executable push XLA's
    gather lowering onto a catastrophically slow path on TPU (measured 35 ms vs 0.03 ms
    for one 1M-point gather).
    """
    st = cfg.stabilization
    rc = cfg.ransac

    def step(
        state: MosaicState,
        frames: jnp.ndarray,
        base_key: jax.Array,
        fweight: jnp.ndarray,
        weight_table: jnp.ndarray,
    ):
        b = frames.shape[0]
        frames_cm = jnp.moveaxis(frames.astype(jnp.float32), -1, 1)  # [B, 3, H, W]

        # --- 1. batched feature extraction ---
        grays = jax.vmap(color.bgr2gray)(frames)
        kps, descs, valids = _extract_features_batch(grays, cfg)

        # --- 2. batched pairwise match + RANSAC (pair b: frame b vs frame b-1) ---
        kp_prev = jnp.concatenate([state.kp[None], kps[:-1]], axis=0)
        desc_prev = jnp.concatenate([state.desc[None], descs[:-1]], axis=0)
        valid_prev = jnp.concatenate([state.kp_valid[None], valids[:-1]], axis=0)

        def pair_fn(kq, dq, vq, kt, dt, vt, pair_key):
            m = _match_pair(dq, vq, dt, vt, cfg)
            src, dst, mvalid = match_ops.gather_correspondences(kq, kt, m)
            res = geo.ransac_homography(
                src,
                dst,
                mvalid,
                pair_key,
                num_hypotheses=rc.num_hypotheses,
                reproj_threshold=rc.reproj_threshold,
                refine_iterations=rc.refine_iterations,
                min_matches=rc.min_matches,
            )
            return res.H, res.num_inliers, res.ok, jnp.sum(mvalid.astype(jnp.int32))

        keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
            state.frame_idx + jnp.arange(b)
        )
        H_rels, n_inl, r_ok, n_match = jax.vmap(pair_fn)(
            kps, descs, valids, kp_prev, desc_prev, valid_prev, keys
        )

        # --- 3a. light pre-scan: validate -> smooth -> compose (3x3 math only) ---
        hc, wc = state.canvas.shape[1], state.canvas.shape[2]

        def pre_body(carry, xs):
            H_old, hbuf, hcount = carry
            H_rel, ok_r = xs
            # Skip semantics (reference main.py:722-731): on a match/RANSAC failure
            # the reference returns early — no warp, no blend, no history push, and
            # the previous frame's features/H_old stay the matching target. A
            # *validation* failure (main.py:734-737) instead degrades H_rel to
            # identity and continues (frame IS blended at the previous pose).
            ok_v = geo.validate_homography(
                H_rel, st.translation_threshold, st.scale_threshold, st.perspective_threshold
            )
            ok = ok_r & ok_v
            H_v = jnp.where(ok, H_rel, geo.EYE3)
            if st.enabled:
                hbuf2, hcount2, H_s = geo.smooth_homography_step(hbuf, hcount, H_v, weight_table)
            else:
                hbuf2, hcount2, H_s = hbuf, hcount, H_v
            hbuf = jnp.where(ok_r, hbuf2, hbuf)
            hcount = jnp.where(ok_r, hcount2, hcount)
            # full-precision compose: the TPU's default bf16 matmul rounding
            # would compound across the 592-frame H chain (see geometry._mm)
            H_abs = jnp.where(
                ok_r, jnp.matmul(H_old, H_s, precision=jax.lax.Precision.HIGHEST), H_old
            )
            tp_ok = warp_ops.two_pass_regime_ok(H_abs, hc, wc)
            pl_ok = warp_ops.pallas_regime_ok(
                H_abs, hc, wc, frame_shape[0], frame_shape[1]
            )
            return (H_abs, hbuf, hcount), (H_abs, ok, ok_r, tp_ok, pl_ok)

        (H_old, hbuf, hcount), (H_abs_seq, ok_seq, blended_seq, tp_seq, pl_seq) = jax.lax.scan(
            pre_body, (state.H_old, state.hbuf, state.hcount), (H_rels, r_ok)
        )

        # --- 3b. paint scan: warp + blend with a WINDOW-level regime cond.
        # A per-frame lax.cond inside the scan costs ~2 ms/frame in lost fusion
        # (measured); instead one cond picks an all-two-pass scan (the norm) or
        # the exact gather scan (any out-of-regime frame in the window).
        # Scalar weight geometry for the whole window OUTSIDE the scan: ~300
        # scalar-core ops per frame cost ~0.5 ms/frame when traced inside the
        # scan body; vmapped here they are one small batched computation.
        fw_params = jax.vmap(
            lambda Hh: warp_ops.frame_weight_params(
                Hh, frame_shape[0], frame_shape[1], hc, wc
            )
        )(H_abs_seq)

        def paint_scan(warp_fn):
            def run(operand):
                canvas0, union0 = operand
                # Per-frame warp + weight construction is frame-INDEPENDENT —
                # batch it over the window instead of serializing it inside the
                # blend scan (round-4: the in-scan version measured ~3.7
                # ms/frame of the 6.2 ms step; [B, Hc, Wc]-batched ops use the
                # VPU far better than B serial [Hc, Wc] ops). Only the blend
                # recurrence (w_old depends on the running canvas) stays
                # sequential — exactly the reference's frame-by-frame
                # semantics (main.py:884-905).
                # lax.map (not vmap): vmapping the Pallas warp multiplies its
                # scoped-VMEM stack by B and OOMs at 1080p canvases; the warp
                # is ~0.2 ms/frame — the batching win is in the weight chain.
                new_seq = jax.lax.map(
                    lambda xs: warp_fn(xs[0], xs[1]), (frames_cm, H_abs_seq)
                )
                wq_seq = jax.vmap(
                    lambda fw: warp_ops.frame_weight_eval(fw, hc, wc)
                )(fw_params)
                wnew_seq = jax.vmap(warp_ops.frame_weight_with_holes)(new_seq, wq_seq)
                # skipped frame -> no-op blend
                wnew_seq = jnp.where(blended_seq[:, None, None], wnew_seq, 0.0)
                foot_seq = jax.vmap(warp_ops.coarse_footprint)(wnew_seq)

                # reference blend semantics: weights = distance transforms of
                # the new frame mask and the current mosaic mask. The mosaic
                # mask before frame i is union0 OR the first i footprints — a
                # cumulative OR — so the union-distance transforms (the last
                # serial cost in the blend scan) batch out here, leaving the
                # scan body pure elementwise blending. Same math, same values,
                # same order as the in-scan form.
                inc = jax.lax.associative_scan(jnp.logical_or, foot_seq, axis=0)
                unions_before = jnp.concatenate(
                    [union0[None], union0[None] | inc[:-1]], axis=0
                )
                # coarse_union_distance's column combine is [Gh, Gh, Gw] per
                # frame; chunk the batch so the transient stays bounded even
                # if XLA materializes it (1080p coarse grids are ~500^2 cells)
                gh, gw = union0.shape
                bs = max(1, min(b, (256 << 20) // max(gh * gh * gw * 4, 1)))
                ups = jax.lax.map(
                    lambda u: warp_ops.upsample_weight(
                        warp_ops.coarse_union_distance(u), hc, wc
                    ),
                    unions_before,
                    batch_size=bs,
                )
                # canvas coverage before frame i: painted pixels are exactly
                # w_new > 0 (frame_weight_with_holes zeroes holes), so the
                # cover gate is the same cumulative-OR shape as the union
                cover0 = jnp.max(canvas0, axis=0) > 0.0
                incc = jax.lax.associative_scan(
                    jnp.logical_or, wnew_seq > 0.0, axis=0
                )
                covers_before = jnp.concatenate(
                    [cover0[None], cover0[None] | incc[:-1]], axis=0
                )
                wold_seq = jnp.where(
                    covers_before,
                    jnp.maximum(ups - warp_ops.CELL_PX / 2.0, 1.0),
                    0.0,
                )
                # The 31x31-smoothed blend weights (reference main.py:894-898)
                # depend only on (w_new, w_old) — both fully batched above —
                # so the two Gaussian blurs per frame ALSO batch out of the
                # scan; the scan body is pure elementwise compositing.
                alpha_seq, beta_seq = jax.vmap(warp_ops.blend_weights_smoothed)(
                    wnew_seq, wold_seq
                )

                def body(canvas, xs):
                    new_px, w_new, w_old, al, be = xs
                    return warp_ops.blend_apply_cm(canvas, new_px, w_new, w_old, al, be), None

                canvas, _ = jax.lax.scan(
                    body, canvas0, (new_seq, wnew_seq, wold_seq, alpha_seq, beta_seq)
                )
                return canvas, union0 | inc[-1]

            return run

        # Tiered warp selection, one cond per window: the Pallas fused kernel
        # (~0.15 ms/frame) in its regime, the XLA two-pass (~2 ms) when only
        # the shear bound fails, the exact gather (~10x two-pass) otherwise.
        all_two_pass = jnp.all(tp_seq | ~blended_seq)
        xla_tiers = lambda operand: jax.lax.cond(
            all_two_pass,
            paint_scan(lambda f, h: warp_ops.warp_two_pass(f, h, hc, wc)),
            paint_scan(lambda f, h: warp_ops._warp_gather_cm(f, h, hc, wc)),
            operand,
        )
        if _use_pallas_warp():
            from rtvm_tpu.ops.pallas_warp import warp_two_pass_pallas

            all_pallas = jnp.all(pl_seq | ~blended_seq)
            canvas, union = jax.lax.cond(
                all_pallas,
                paint_scan(lambda f, h: warp_two_pass_pallas(f, h, hc, wc)),
                xla_tiers,
                (state.canvas, state.union_coarse),
            )
        else:
            canvas, union = xla_tiers((state.canvas, state.union_coarse))

        # last ACCEPTED frame's features become the next matching target
        any_ok = jnp.any(blended_seq)
        last = b - 1 - jnp.argmax(blended_seq[::-1])
        kp_l = jnp.where(any_ok, jnp.take(kps, last, axis=0), state.kp)
        desc_l = jnp.where(any_ok, jnp.take(descs, last, axis=0), state.desc)
        valid_l = jnp.where(any_ok, jnp.take(valids, last, axis=0), state.kp_valid)

        new_state = MosaicState(
            canvas=canvas,
            union_coarse=union,
            H_old=H_old,
            kp=kp_l,
            desc=desc_l,
            kp_valid=valid_l,
            hbuf=hbuf,
            hcount=hcount,
            frame_idx=state.frame_idx + b,
        )
        aux = WindowAux(
            num_matches=n_match, num_inliers=n_inl, H_abs=H_abs_seq, ok=ok_seq,
            blended=blended_seq, two_pass=tp_seq,
        )
        return new_state, aux

    return step


def make_window_step(frame_shape: Tuple[int, int, int], cfg: MosaicConfig):
    """Jitted single-window step (one blocked dispatch per B-frame window)."""
    return jax.jit(make_step_body(frame_shape, cfg), donate_argnums=(0,))


def make_clip_step(
    frame_shape: Tuple[int, int, int],
    cfg: MosaicConfig,
    det_fn=None,
):
    """Fused MULTI-window step: one jitted dispatch scans W whole windows.

    The round-2 bench paid one host<->device tunnel round trip (~30 ms) per
    16-frame window — a 40%+ tax on the measured throughput that had to be
    RTT-"corrected" away. Here the windows are pre-staged in HBM as
    [W, B, H, Wd, 3] uint8 and a `lax.scan` over the existing window body runs
    the whole clip in ONE blocked dispatch, so the raw blocked time IS the
    device time (RTT amortizes to < 0.1%). Matches the reference hot loop
    (main.py:1596-1632) semantics exactly: the scan carries the same
    MosaicState the per-window path carries.

    det_fn, if given, is a jittable frames_u8[B,H,W,3] -> pytree detection
    function (e.g. ObjectDetector._infer_fn(...)); it runs in the SAME
    dispatch so stitch + per-frame YOLO (BASELINE config 3) is one dispatch.
    Detection is hoisted OUT of the window scan and run once over the whole
    clip as a single [W*B, ...] batch: the per-frame result is identical
    (detection has no cross-frame state), but the v8n convs tile the MXU at
    batch W*B instead of B, and XLA schedules one conv pass instead of W.

    MEMORY BOUND: detector activation memory therefore scales with the CLIP
    length W*B, not the window size B. The pipeline's chunked dispatcher
    (RTVM_CLIP_CHUNK, default 6 windows = 96 frames) keeps this bounded; a
    caller passing a long clip directly to process_clip with det_fn should
    chunk it the same way or risk HBM exhaustion at a few hundred frames.

    Returns clip(state, windows_u8 [W,B,H,Wd,3], base_key, fweight, wtable)
    -> (state, WindowAux stacked over W[, detections stacked over W]).
    """
    body = make_step_body(frame_shape, cfg)

    def clip(state, windows, base_key, fweight, wtable):
        def scan_body(st, frames):
            st2, aux = body(st, frames, base_key, fweight, wtable)
            return st2, (aux,)

        state, ys = jax.lax.scan(scan_body, state, windows)
        if det_fn is not None:
            w, b = windows.shape[0], windows.shape[1]
            flat = windows.reshape((w * b,) + windows.shape[2:])
            dets = jax.tree_util.tree_map(
                lambda a: a.reshape((w, b) + a.shape[1:]), det_fn(flat)
            )
            return (state,) + tuple(ys) + (dets,)
        return (state,) + tuple(ys)

    return jax.jit(clip, donate_argnums=(0,))


class VideMosaic:
    """Drop-in counterpart of the reference VideMosaic (main.py:15), TPU-native inside.

    Frames are BGR uint8 numpy/JAX arrays of a fixed shape (set by the first frame).
    """

    def __init__(
        self,
        first_image,
        output_height_times: float = 2.0,
        output_width_times: float = 1.2,
        detector_type: str = "sift",
        show_intermediate: bool = True,
        output_dir: Optional[str] = None,
        visualize: bool = False,
        config: Optional[MosaicConfig] = None,
        seed: int = 0,
    ):
        import dataclasses

        if config is None:
            config = MosaicConfig(
                output_height_times=output_height_times,
                output_width_times=output_width_times,
            )
        if detector_type != config.features.detector_type:
            config = dataclasses.replace(
                config,
                features=dataclasses.replace(config.features, detector_type=detector_type),
            )
        self.config = config
        self.detector_type = config.features.detector_type
        self.show_intermediate = show_intermediate
        self.output_dir = output_dir
        self.visualize = visualize

        first_image = np.asarray(first_image)
        h, w, c = first_image.shape
        self.frame_shape = (h, w, c)
        if config.canvas_hw is not None:
            # Pre-scanned geometry (mosaic/prescan.py): exact canvas + seed
            # placement so the fused clip path never needs reactive growth.
            hc, wc = config.canvas_hw
            self.canvas_shape = (hc, wc, c)
            r0, c0 = config.seed_offset or (hc - h, int(wc / 2 - w / 2))
            self.w_offset = int(np.clip(r0, 0, hc - h))  # row offset
            self.h_offset = int(np.clip(c0, 0, wc - w))  # col offset
        else:
            hc = int(config.output_height_times * h)
            wc = int(config.output_width_times * w)
            self.canvas_shape = (hc, wc, c)
            # Reference offsets (main.py:85-88): frame 0 sits at the bottom,
            # centered in x.
            self.w_offset = hc - h  # row offset
            self.h_offset = int(wc / 2 - w / 2)  # col offset

        self._window_steps = {}  # window size -> jitted step
        self._feature_fn = get_feature_fn(self.config)
        self._key = jax.random.PRNGKey(seed)
        # Device-resident invariants, passed as jit ARGS each step (see make_window_step
        # performance note — they must not become executable constants).
        # Raw pixel distances to the frame edge == distanceTransform of the new
        # frame's mask (reference main.py:888), matching the union-distance units.
        self._fweight = jax.device_put(warp_ops.edge_distance_px(h, w))
        self._wtable = jax.device_put(
            np.asarray(geo.smoothing_weights(config.stabilization.history_size))
        )

        self.state = self._init_state(first_image)
        self._callbacks_H: list = []

    # ------------------------------------------------------------------ init
    def _init_state(self, first_image: np.ndarray) -> MosaicState:
        h, w, c = self.frame_shape
        hc, wc, _ = self.canvas_shape
        cfg = self.config

        kp, desc, valid = self._feature_fn(jnp.asarray(first_image))

        canvas = jnp.zeros((c, hc, wc), jnp.float32)
        canvas = canvas.at[
            :, self.w_offset : self.w_offset + h, self.h_offset : self.h_offset + w
        ].set(jnp.moveaxis(jnp.asarray(first_image, jnp.float32), -1, 0))
        seed_w = jnp.zeros((hc, wc), jnp.float32)
        seed_w = seed_w.at[
            self.w_offset : self.w_offset + h, self.h_offset : self.h_offset + w
        ].set(self._fweight)
        union = warp_ops.coarse_footprint(seed_w)

        H_old = jnp.asarray(
            np.array(
                [[1.0, 0.0, self.h_offset], [0.0, 1.0, self.w_offset], [0.0, 0.0, 1.0]],
                dtype=np.float32,
            )
        )
        s = cfg.stabilization.history_size
        return MosaicState(
            canvas=canvas,
            union_coarse=union,
            H_old=H_old,
            kp=kp,
            desc=desc,
            kp_valid=valid,
            hbuf=jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (s, 1, 1)),
            hcount=jnp.int32(0),
            frame_idx=jnp.int32(1),
        )

    # -------------------------------------------------------------- stepping
    def _get_step(self, b: int):
        # b is part of the jit specialization implicitly (frames shape); the step
        # function itself is shared process-wide.
        return get_window_step(self.frame_shape, self.config)

    def process_window(self, frames: np.ndarray) -> WindowAux:
        """Process a [B, H, W, 3] uint8 window of consecutive frames (fast path)."""
        frames = jnp.asarray(frames, jnp.uint8)
        step = self._get_step(int(frames.shape[0]))
        self.state, aux = step(self.state, frames, self._key, self._fweight, self._wtable)
        pad = (0, 0)
        if self.config.auto_grow:
            pad = self._maybe_grow(aux)
        if self.output_dir and (self.visualize or self.show_intermediate):
            # Throttled: a full-canvas device->host pull per window would stall the
            # TPU pipeline; every 4th window is plenty for progress monitoring.
            self._windows_seen = getattr(self, "_windows_seen", 0) + 1
            if self._windows_seen % 4 == 1:
                self._dump_intermediate(np.asarray(frames), aux, pad)
        return aux

    def process_clip(self, windows: np.ndarray, det_fn=None):
        """Process [W, B, H, Wd, 3] uint8 windows in ONE fused device dispatch
        (lax.scan over window steps — see make_clip_step). The fast path for
        long pre-decoded spans; per-window host work (auto-grow, intermediate
        dumps) is intentionally skipped, so use process_window when the canvas
        may grow mid-span."""
        windows = jnp.asarray(windows, jnp.uint8)
        key = (windows.shape[1:], det_fn)
        if not hasattr(self, "_clip_steps"):
            self._clip_steps = {}
        if key not in self._clip_steps:
            self._clip_steps[key] = make_clip_step(self.frame_shape, self.config, det_fn)
        out = self._clip_steps[key](
            self.state, windows, self._key, self._fweight, self._wtable
        )
        self.state = out[0]
        return out[1] if det_fn is None else (out[1], out[2])

    def _maybe_grow(self, aux: "WindowAux") -> tuple:
        """Grow-on-demand HBM canvas (config-5 streaming; SURVEY section 5
        'long-video/unbounded canvas'). Host-side check on the window's warped
        corners; growth pads the on-device canvas/union grid and shifts the
        coordinate origin through H_old. Growth amounts are quantized to
        `grow_quantum` px so the window step re-specializes at most a handful
        of times over an arbitrarily long video.

        Returns the (left, top) pad applied — (0, 0) when no growth — so
        callers can shift coordinates computed in pre-growth canvas space
        (aux.H_abs is pre-growth; see _dump_intermediate)."""
        cfg = self.config
        h, w = self.frame_shape[:2]
        hc, wc, c = self.canvas_shape
        hs = np.asarray(aux.H_abs)
        blended = np.asarray(aux.blended)
        corners_src = np.array(
            [[0.0, 0.0, 1.0], [w, 0.0, 1.0], [w, float(h), 1.0], [0.0, float(h), 1.0]]
        ).T
        xs_all, ys_all = [], []
        for Hm, ok in zip(hs, blended):
            if not ok:
                continue
            p = Hm.astype(np.float64) @ corners_src
            den = p[2]
            if np.any(den <= 1e-9):
                continue
            xs_all.append(p[0] / den)
            ys_all.append(p[1] / den)
        if not xs_all:
            return (0, 0)
        xs_f = np.concatenate(xs_all)
        ys_f = np.concatenate(ys_all)
        # Look ahead one window: growth is checked AFTER painting, so content
        # that moves more than grow_margin past the edge within the NEXT window
        # would be clipped before the next check. Extrapolate the per-frame
        # drift of the frame centroid over the window length and widen the
        # extent on the motion side only.
        if len(xs_all) >= 2:
            n_ahead = len(hs)
            vx = float(np.mean(xs_all[-1]) - np.mean(xs_all[-2]))
            vy = float(np.mean(ys_all[-1]) - np.mean(ys_all[-2]))
            xs_f = np.concatenate([xs_f, xs_all[-1] + vx * n_ahead])
            ys_f = np.concatenate([ys_f, ys_all[-1] + vy * n_ahead])
        m, q = cfg.grow_margin, cfg.grow_quantum

        def need(amount):
            return int(np.ceil(max(amount, 0.0) / q) * q) if amount > 0 else 0

        left = need(m - xs_f.min())
        top = need(m - ys_f.min())
        right = need(xs_f.max() - (wc - 1 - m))
        bottom = need(ys_f.max() - (hc - 1 - m))
        if not (left or top or right or bottom):
            return (0, 0)
        st = self.state
        canvas = jnp.pad(st.canvas, ((0, 0), (top, bottom), (left, right)))
        cell = warp_ops.CELL_PX
        union = jnp.pad(
            st.union_coarse, ((top // cell, bottom // cell), (left // cell, right // cell))
        )
        shift = jnp.asarray(
            np.array([[1.0, 0.0, left], [0.0, 1.0, top], [0.0, 0.0, 1.0]], np.float32)
        )
        self.state = st._replace(
            canvas=canvas,
            union_coarse=union,
            H_old=jnp.matmul(shift, st.H_old, precision=jax.lax.Precision.HIGHEST),
        )
        self.canvas_shape = (hc + top + bottom, wc + left + right, c)
        self.w_offset += top
        self.h_offset += left
        return (left, top)

    def process_frame(self, frame_cur, frame_count: int = 0) -> bool:
        """Reference-parity single-frame path (main.py:710). Returns True if the frame's
        homography was accepted (False means identity fallback was used)."""
        aux = self.process_window(np.asarray(frame_cur)[None])
        return bool(np.asarray(aux.ok)[0])

    # -------------------------------------------------------------- outputs
    @property
    def output_img(self) -> np.ndarray:
        """Canvas as [Hc, Wc, 3] float array (reference keeps a float canvas)."""
        return np.moveaxis(np.asarray(self.state.canvas), 0, -1)

    @property
    def output_img_u8(self) -> np.ndarray:
        return np.clip(self.output_img, 0, 255).astype(np.uint8)

    @property
    def H_old(self) -> np.ndarray:
        return np.asarray(self.state.H_old)

    def get_transformed_corners(self, frame, H) -> np.ndarray:
        h, w = np.asarray(frame).shape[:2]
        return np.asarray(geo.transform_corners(w, h, jnp.asarray(H, jnp.float32)))

    @staticmethod
    def draw_border(image: np.ndarray, corners: np.ndarray, color=(0, 0, 0), thickness: int = 5):
        """Draw the warped frame's border polygon on the mosaic (reference
        draw_border, main.py:952-977 — same closed-loop line order)."""
        import cv2

        c = np.asarray(corners).reshape(1, -1, 2).astype(int)
        for i in range(c.shape[1] - 1, -1, -1):
            cv2.line(image, tuple(c[0, i]), tuple(c[0, i - 1]), color=color, thickness=thickness)
        return image

    def render_matches(self, frame_prev: np.ndarray, frame_cur: np.ndarray) -> np.ndarray:
        """cv2.drawMatches-style visualization of the current frame pair
        (reference main.py:700-708): side-by-side images, lines between matched
        keypoints. Recomputes features on the host path — debug-only cost."""
        import cv2

        from rtvm_tpu.ops import match as match_ops

        kp_c, d_c, v_c = self._feature_fn(jnp.asarray(frame_cur))
        kp_p, d_p, v_p = self._feature_fn(jnp.asarray(frame_prev))
        m = _match_pair(d_c, v_c, d_p, v_p, self.config)
        src, dst, valid = match_ops.gather_correspondences(kp_c, kp_p, m)
        src, dst, valid = np.asarray(src), np.asarray(dst), np.asarray(valid)

        h1, w1 = frame_cur.shape[:2]
        h2, w2 = frame_prev.shape[:2]
        canvas = np.zeros((max(h1, h2), w1 + w2, 3), np.uint8)
        canvas[:h1, :w1] = frame_cur
        canvas[:h2, w1:] = frame_prev
        rng = np.random.RandomState(0)
        for s, d in zip(src[valid], dst[valid]):
            colr = tuple(int(v) for v in rng.randint(64, 255, 3))
            p1 = (int(s[0]), int(s[1]))
            p2 = (int(d[0]) + w1, int(d[1]))
            cv2.circle(canvas, p1, 3, colr, 1)
            cv2.circle(canvas, p2, 3, colr, 1)
            cv2.line(canvas, p1, p2, colr, 1)
        return canvas

    def _dump_intermediate(self, frames: np.ndarray, aux: "WindowAux", pad=(0, 0)):
        """Per-window debug artifacts when show_intermediate/visualize are on and an
        output_dir exists (headless stand-in for the reference's cv2.imshow windows,
        main.py:700-708,751): mosaic_progress.jpg with the last frame's border, and
        matches.jpg for the window's final frame pair. `pad` is the (left, top)
        auto-grow pad applied after this window's step: aux.H_abs is expressed
        in PRE-growth canvas coordinates, so the drawn border must shift."""
        import os

        import cv2

        os.makedirs(self.output_dir, exist_ok=True)
        if self.show_intermediate:
            img = self.output_img_u8.copy()
            H_last = np.asarray(aux.H_abs)[-1]
            corners = self.get_transformed_corners(frames[-1], H_last)
            corners = corners + np.asarray(pad, corners.dtype)
            self.draw_border(img, corners)
            cv2.imwrite(os.path.join(self.output_dir, "mosaic_progress.jpg"), img)
        if self.visualize and len(frames) >= 2:
            cv2.imwrite(
                os.path.join(self.output_dir, "matches.jpg"),
                self.render_matches(frames[-2], frames[-1]),
            )

    @staticmethod
    def findHomography(src_pts: np.ndarray, dst_pts: np.ndarray, seed: int = 0):
        """Estimate a homography from correspondences (reference main.py:836 parity,
        array-based instead of cv2 keypoint objects)."""
        src = jnp.asarray(src_pts, jnp.float32).reshape(-1, 2)
        dst = jnp.asarray(dst_pts, jnp.float32).reshape(-1, 2)
        valid = jnp.ones((src.shape[0],), bool)
        res = geo.ransac_homography(src, dst, valid, jax.random.PRNGKey(seed))
        return np.asarray(res.H), np.asarray(res.inliers)

    # --------------------------------------------- reference API-surface parity
    def process_first_frame(self, first_image) -> None:
        """Re-seed the previous-frame features (reference main.py:104-112)."""
        kp, desc, valid = self._feature_fn(jnp.asarray(np.asarray(first_image)))
        self.state = self.state._replace(kp=kp, desc=desc, kp_valid=valid)

    def match(self, des_cur, des_prev, valid_cur=None, valid_prev=None):
        """Descriptor matching (reference main.py:676-708). Returns a Matches tuple."""
        des_cur = jnp.asarray(des_cur)
        des_prev = jnp.asarray(des_prev)
        vc = jnp.ones(des_cur.shape[0], bool) if valid_cur is None else jnp.asarray(valid_cur)
        vp = jnp.ones(des_prev.shape[0], bool) if valid_prev is None else jnp.asarray(valid_prev)
        return _match_pair(des_cur, vc, des_prev, vp, self.config)

    def validate_homography(self, H) -> bool:
        """Anti-shake validation (reference main.py:761-801 thresholds)."""
        st = self.config.stabilization
        return bool(
            geo.validate_homography(
                jnp.asarray(H, jnp.float32),
                st.translation_threshold,
                st.scale_threshold,
                st.perspective_threshold,
            )
        )

    def smooth_homography(self, H) -> np.ndarray:
        """Sliding-window homography smoothing (reference main.py:803-834);
        mutates the instance history like the reference."""
        hbuf, hcount, H_s = geo.smooth_homography_step(
            self.state.hbuf, self.state.hcount, jnp.asarray(H, jnp.float32), self._wtable
        )
        self.state = self.state._replace(hbuf=hbuf, hcount=hcount)
        return np.asarray(H_s)

    def warp(self, frame_cur, H) -> np.ndarray:
        """Warp + blend one frame into the canvas with an explicit absolute H
        (reference main.py:861-927). Returns the updated canvas."""
        hc, wc = self.canvas_shape[0], self.canvas_shape[1]
        frame_cm = jnp.moveaxis(jnp.asarray(np.asarray(frame_cur), jnp.float32), -1, 0)
        new_px, w_new = warp_ops.warp_frame_cm(
            frame_cm, self._fweight, jnp.asarray(H, jnp.float32), hc, wc
        )
        w_old = warp_ops.union_weight(self.state.canvas, self.state.union_coarse, hc, wc)
        canvas, _ = warp_ops._blend_cm(self.state.canvas, w_old, new_px, w_new)
        union = self.state.union_coarse | warp_ops.coarse_footprint(w_new)
        self.state = self.state._replace(canvas=canvas, union_coarse=union)
        return self.output_img

    @property
    def _detector(self):
        if not hasattr(self, "_detector_inst"):
            from rtvm_tpu.detect.detector import ObjectDetector

            self._detector_inst = ObjectDetector()
        return self._detector_inst

    def detect_people(self, frame):
        """Person boxes (reference detect_people, main.py:114-131)."""
        return self._detector.detect_people(np.asarray(frame))

    def detect_objects(self, image):
        """Multi-pass aerial detection (reference detect_objects, main.py:149-349)."""
        return self._detector.detect_objects(np.asarray(image))

    def checkpoint(self) -> dict:
        """Serializable snapshot of the full pipeline state (new capability; the
        reference's state tuple is identified in SURVEY.md section 5)."""
        return {k: np.asarray(v) for k, v in self.state._asdict().items()}

    def restore(self, snap: dict) -> None:
        self.state = MosaicState(**{k: jnp.asarray(v) for k, v in snap.items()})
