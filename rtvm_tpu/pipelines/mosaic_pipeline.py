"""End-to-end mosaic pipeline driver — behavioral port of reference main.main()
(main.py:1512-1717) with a TPU-windowed hot loop.

Output contract preserved (SURVEY.md section 1/5): writes `mosaic.jpg` and (when
detection/navigation are enabled) `navigation_map.jpg` + `Detections/` into
output_dir (default cwd); progress print every 50 frames including the reference's
Russian-language line (the web UI's stdout parser consumes it); per-frame
`update_callback(frame_count, mosaic, progress_pct)`.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import numpy as np

from rtvm_tpu.config import MosaicConfig, PipelineConfig
from rtvm_tpu.io.video import VideoReader
from rtvm_tpu.mosaic.stitcher import VideMosaic
from rtvm_tpu.utils.image import crop_black_areas, scale_to_screen
from rtvm_tpu.utils.timing import StageTimer

DEFAULT_VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"


def run_mosaic(
    video_path: str,
    config: Optional[MosaicConfig] = None,
    detector_type: str = "sift",
    update_callback: Optional[Callable] = None,
    callback_every: int = 10,
    max_frames: Optional[int] = None,
    timer: Optional[StageTimer] = None,
    per_frame_detector=None,
    detections_dir: Optional[str] = None,
    show_intermediate: bool = False,
    visualize: bool = False,
    viz_dir: Optional[str] = None,
    fused: bool = False,
) -> tuple[VideMosaic, dict]:
    """Stitch a whole video. Returns (stitcher, stats).

    update_callback(frame_count, mosaic_u8, progress_pct) mirrors the reference protocol
    (main.py:1630-1632) but is invoked per window (a full-canvas device->host copy per
    frame would throttle the TPU for no benefit).

    fused=True streams the decoded windows into chunked multi-window device
    dispatches (VideMosaic.process_clip: lax.scan over window steps) — the
    fast path when no per-window host work is needed; update_callback fires
    once per chunk (~RTVM_CLIP_CHUNK x window frames — the live GUI/web feed)
    plus once at 100%, and intermediate dumps are unavailable.
    """
    if fused:
        # The fused scan cannot honor per-window host work: Detections/*.jpg
        # dumps, intermediate visualization. auto_grow alone no longer forces
        # the downgrade: a cheap host-side motion pre-scan sizes the canvas up
        # front so the fused path runs growth-free (reactive growth stays the
        # fallback when the pre-scan cannot track the clip).
        needs_host_work = (
            detections_dir is not None or show_intermediate or visualize
        )
        if not needs_host_work and config is not None and config.auto_grow:
            import dataclasses

            from rtvm_tpu.mosaic.prescan import prescan_canvas_from_video

            pre = prescan_canvas_from_video(video_path, max_frames=max_frames)
            if pre is not None:
                config = dataclasses.replace(
                    config, canvas_hw=pre[0], seed_offset=pre[1], auto_grow=False
                )
                print(
                    f"run_mosaic: предварительное сканирование — холст "
                    f"{pre[0][0]}x{pre[0][1]}, смещение {pre[1]}"
                )
            else:
                needs_host_work = True  # reactive growth requires the window loop
        if needs_host_work:
            print(
                "run_mosaic: fused=True понижен до оконного цикла "
                "(detections_dir/визуализация/неотслеживаемый рост требуют "
                "пооконной обработки)"
            )
        else:
            return _run_mosaic_fused(
                video_path, config=config, detector_type=detector_type,
                update_callback=update_callback, max_frames=max_frames,
                timer=timer, per_frame_detector=per_frame_detector,
            )
    config = config or MosaicConfig()
    timer = timer or StageTimer()
    reader = VideoReader(video_path, window=config.window_size, max_frames=max_frames)
    total_hint = reader.frame_count_hint if reader.frame_count_hint > 0 else None
    if total_hint and max_frames:
        total_hint = min(total_hint, max_frames)  # pct against what will actually run

    with timer.stage("init"):
        mosaic = VideMosaic(
            reader.first_frame,
            output_height_times=config.output_height_times,
            output_width_times=config.output_width_times,
            detector_type=detector_type,
            config=config,
            show_intermediate=show_intermediate,
            visualize=visualize,
            output_dir=viz_dir if (show_intermediate or visualize) else None,
        )

    frame_count = 1
    ok_frames = 0
    per_frame_dets = []
    aux_pending = []  # device-side aux; fetched after the loop so the TPU never stalls
    t0 = time.perf_counter()
    windows = 0
    first_done = [None, 1]  # (t after first window, frames it covered)
    import jax

    for frames, n_valid in reader.windows():
        with timer.stage("window"):
            aux = mosaic.process_window(frames)
            # Counterintuitive but measured: the axon tunnel runs back-to-back queued
            # dispatches ~4x slower than block-per-call; sync each window.
            jax.block_until_ready(mosaic.state.canvas)
        aux_pending.append((aux, n_valid))
        if per_frame_detector is not None:
            # batched per-frame detection over the same window (BASELINE config 3)
            with timer.stage("detect"):
                dets = per_frame_detector._run_pass(frames[:n_valid], imgsz=640, conf=0.25, iou=0.45)
            per_frame_dets.extend(dets)
            if detections_dir is not None:
                import cv2

                os.makedirs(detections_dir, exist_ok=True)
                for i, d in enumerate(dets):
                    if d:
                        vis = per_frame_detector.draw_detections(frames[i], d)
                        cv2.imwrite(
                            os.path.join(detections_dir, f"frame_{frame_count + i:05d}_detected.jpg"),
                            vis,
                        )
        windows += 1
        frame_count += n_valid
        if first_done[0] is None:
            first_done[:] = [time.perf_counter(), frame_count]
        if frame_count % 50 < config.window_size:
            pct = 100.0 * frame_count / total_hint if total_hint else 0.0
            print(f"Обработан кадр {frame_count}/{total_hint or '?'} ({pct:.1f}%)")
            print(f"Processed frame {frame_count}/{total_hint or '?'} ({pct:.1f}%)")
        if update_callback is not None and windows % callback_every == 0:
            pct = 100.0 * frame_count / total_hint if total_hint else 0.0
            update_callback(frame_count, mosaic.output_img_u8, pct)
    # make sure all device work is done before timing
    np.asarray(mosaic.state.frame_idx)
    elapsed = time.perf_counter() - t0
    two_pass_frames = 0
    for aux, n_valid in aux_pending:
        ok_frames += int(np.asarray(aux.ok)[:n_valid].sum())
        two_pass_frames += int(np.asarray(aux.two_pass)[:n_valid].sum())

    stats = {
        "frames": frame_count,
        "accepted": ok_frames,
        "two_pass_frames": two_pass_frames,  # rest used the slow gather fallback
        "elapsed_s": elapsed,
        "fps": frame_count / elapsed if elapsed > 0 else 0.0,
    }
    if per_frame_detector is not None:
        stats["per_frame_detections"] = sum(len(d) for d in per_frame_dets)
    if first_done[0] is not None and frame_count > first_done[1]:
        # steady-state wall rate past the first window's jit trace + compile
        steady_el = elapsed - (first_done[0] - t0)
        if steady_el > 0:
            stats["steady_fps"] = (frame_count - first_done[1]) / steady_el
            stats["first_window_s"] = first_done[0] - t0
    return mosaic, stats


def _run_mosaic_fused(
    video_path: str,
    config: Optional[MosaicConfig] = None,
    detector_type: str = "sift",
    update_callback: Optional[Callable] = None,
    max_frames: Optional[int] = None,
    timer: Optional[StageTimer] = None,
    per_frame_detector=None,
) -> tuple[VideMosaic, dict]:
    """Fused streaming path: decode windows on the reader's worker thread WHILE
    the device stitches the previous chunk (+ optional batched per-frame
    detection INSIDE the same dispatch, BASELINE config 3); tail frames (< one
    window) run via the normal per-window step.

    Decode/dispatch overlap (round-4): chunks of `RTVM_CLIP_CHUNK` windows
    dispatch as soon as they are decoded instead of pre-decoding the whole clip
    (the old behavior serialized ~the full decode wall ahead of the first
    dispatch). `decode_wait` in the timer records only the residual time the
    dispatch loop actually stalled on the decoder."""
    import jax

    config = config or MosaicConfig()
    timer = timer or StageTimer()
    B = config.window_size

    # Chunked fused dispatches: the tunnel governor latches on single
    # dispatches much past ~300 ms (NOTES_ROUND3 finding 15), which would
    # throttle everything that runs after the stitch (detection on the mosaic,
    # nav) — so the clip runs as ceil(W/chunk) dispatches with the state
    # chained on-device. Two jit traces at most (chunk size + remainder).
    chunk = int(os.environ.get("RTVM_CLIP_CHUNK", "6"))

    reader = VideoReader(
        video_path, window=B, queue_depth=2 * chunk, max_frames=max_frames
    )
    with timer.stage("init"):
        mosaic = VideMosaic(
            reader.first_frame,
            detector_type=detector_type,
            config=config,
        )

    det_fn = None
    if per_frame_detector is not None:
        run = per_frame_detector._infer_fn(640, 0.25, 0.45)
        det_fn = lambda fr: run(fr)

    total_hint = reader.frame_count_hint if reader.frame_count_hint > 0 else None
    if total_hint and max_frames:
        total_hint = min(total_hint, max_frames)  # pct against what will actually run
    t0 = time.perf_counter()
    aux = dets = None
    auxes, detss = [], []
    n_full = 0
    n_frames = 0
    first_done = [None, 0]  # (t after first dispatch, windows it covered)
    buf: list = []  # full windows accumulating toward one chunk dispatch
    tail: list = []  # the final short window, if any

    def dispatch(windows):
        nonlocal n_full
        with timer.stage("clip"):
            out = mosaic.process_clip(np.stack(windows), det_fn=det_fn)
            a, d = out if det_fn is not None else (out, None)
            auxes.append(a)
            detss.append(d)
            jax.block_until_ready(mosaic.state.canvas)
        n_full += len(windows)
        if first_done[0] is None:
            first_done[:] = [time.perf_counter(), n_full]
        if update_callback is not None:
            # live GUI/web feed on the fused path (reference gui.py:139-158):
            # one canvas pull per chunk (~chunk*B frames) is cheap next to the
            # dispatch itself, and keeps config 5's preview moving.
            done = 1 + n_full * B
            pct = min(99.0, 100.0 * done / total_hint) if total_hint else 0.0
            with timer.stage("callback"):
                update_callback(done, mosaic.output_img_u8, pct)

    it = reader.windows()
    while True:
        with timer.stage("decode_wait"):
            item = next(it, None)
        if item is None:
            break
        frames, n_valid = item
        n_frames += n_valid
        if n_valid == B:
            buf.append(frames)
        else:
            tail.append((frames, n_valid))
        if len(buf) == chunk:
            dispatch(buf)
            buf = []
    if buf:
        dispatch(buf)  # remainder chunk (second jit trace)
    if auxes:
        aux = jax.tree_util.tree_map(
            lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *auxes
        )
        if det_fn is not None:
            dets = jax.tree_util.tree_map(
                lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *detss
            )
    tail_ok = 0
    for frames, n_valid in tail:
        with timer.stage("window"):
            tail_aux = mosaic.process_window(frames)
        tail_ok += int(np.asarray(tail_aux.ok)[:n_valid].sum())
    np.asarray(mosaic.state.frame_idx)
    elapsed = time.perf_counter() - t0

    frames_total = 1 + n_frames
    ok = (int(np.asarray(aux.ok).sum()) if aux is not None else 0) + tail_ok
    if update_callback is not None:
        update_callback(frames_total, mosaic.output_img_u8, 100.0)
    stats = {
        "frames": frames_total,
        "accepted": ok,
        "elapsed_s": elapsed,
        "fps": frames_total / elapsed if elapsed > 0 else 0.0,
        "decode_wait_s": timer.totals.get("decode_wait", 0.0),
        "fused_windows": n_full,
    }
    if first_done[0] is not None and n_full > first_done[1]:
        # steady-state wall rate: everything after the FIRST chunk dispatch
        # (which carries the jit trace + XLA compile — minutes on the CPU
        # backend, so whole-run fps under-reports what a long clip sustains)
        steady_el = elapsed - (first_done[0] - t0)
        steady_fr = frames_total - (1 + first_done[1] * B)
        if steady_el > 0:
            stats["steady_fps"] = steady_fr / steady_el
            stats["first_chunk_s"] = first_done[0] - t0
    if dets is not None:
        stats["det_scores_shape"] = tuple(np.asarray(dets.scores).shape)
    return mosaic, stats


def main(
    video_path: Optional[str] = None,
    update_callback: Optional[Callable] = None,
    show_intermediate: bool = True,
    output_dir: Optional[str] = None,
    images_dir: Optional[str] = None,
    detector_type: str = "sift",
    enable_detection: bool = True,
    enable_navigation: bool = True,
    per_frame_detection: bool = False,
    config: Optional[PipelineConfig] = None,
    max_frames: Optional[int] = None,
):
    """Reference-parity entry point (main.py:1512). Stitches the video, saves
    mosaic.jpg, runs detection on the mosaic, builds the navigation map."""
    import cv2

    config = config or PipelineConfig()
    out_dir = output_dir or "."
    os.makedirs(out_dir, exist_ok=True)

    if images_dir is not None:
        from rtvm_tpu.pipelines.images_pipeline import process_images_dir

        return process_images_dir(images_dir, out_dir, config)

    video_path = video_path or DEFAULT_VIDEO
    timer = StageTimer()
    det = None
    if per_frame_detection:
        try:
            from rtvm_tpu.detect.detector import ObjectDetector

            det = ObjectDetector(model=config.detect.model)
        except Exception as e:
            print(f"Предупреждение: покадровая детекция недоступна: {e}")
    mosaic, stats = run_mosaic(
        video_path,
        config=config.mosaic,
        detector_type=detector_type,
        update_callback=update_callback,
        max_frames=max_frames,
        timer=timer,
        per_frame_detector=det,
        detections_dir=os.path.join(out_dir, "Detections") if det else None,
        # Headless stand-ins for the reference's cv2.imshow windows: per-window
        # mosaic_progress.jpg / matches.jpg into the output dir (main.py:700-708).
        show_intermediate=show_intermediate,
        viz_dir=out_dir,
    )
    print(f"Скорость сшивки: {stats['fps']:.1f} кадров/с ({stats['frames']} кадров)")

    output_img = mosaic.output_img_u8
    cropped = crop_black_areas(output_img, threshold=80, margin=30)
    scaled = scale_to_screen(cropped)
    mosaic_path = os.path.join(out_dir, "mosaic.jpg")
    cv2.imwrite(mosaic_path, scaled)
    print(f"Мозаика сохранена: {mosaic_path}")

    detections = []
    if enable_detection:
        try:
            from rtvm_tpu.detect.detector import ObjectDetector

            det = ObjectDetector(model=config.detect.model)
            detections = det.detect_objects(scaled, debug_dir=out_dir)
            stats["detections"] = len(detections)
            counts: dict = {}
            for d in detections:
                counts[d["class"]] = counts.get(d["class"], 0) + 1
            for cls, n in sorted(counts.items()):
                print(f"  {cls}: {n}")
        except Exception as e:  # mirror the reference's graceful degradation (main.py:42-70)
            print(f"Предупреждение: детекция недоступна: {e}")

    if enable_navigation:
        try:
            from rtvm_tpu.navigate.mapping import analyze_for_navigation

            nav = analyze_for_navigation(scaled, detections, debug_dir=out_dir)
            nav_path = os.path.join(out_dir, "navigation_map.jpg")
            cv2.imwrite(nav_path, nav)
            print(f"Карта навигации сохранена: {nav_path}")
        except Exception as e:
            print(f"Предупреждение: карта навигации недоступна: {e}")

    if update_callback is not None:
        update_callback(stats["frames"], output_img, 100.0)
    print(timer.report())
    trace_path = os.environ.get("RTVM_TRACE")
    if trace_path:
        # host-side span trace (chrome://tracing / Perfetto); jax.profiler is
        # tunnel-lethal on this platform — see utils/timing.py
        print(f"Трассировка сохранена: {timer.write_chrome_trace(trace_path)}")
    return mosaic, stats
