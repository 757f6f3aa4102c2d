"""Command-line interface.

The primary surface mirrors the reference's argparse exactly (main.py:1720-1732:
positional video_path, --images-dir, --output-dir, --hide); the interactive menus the
reference puts behind input() prompts (slam.py main_menu:1620, depth_to_3d.py
main:1178, soil analyzer slam.py:1428) are exposed as proper subcommands so they are
scriptable: `rtvm slam`, `rtvm depth3d`, `rtvm terrain`, `rtvm stereo-demo`,
`rtvm web`, `rtvm gui`, `rtvm view`.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="rtvm", description="TPU-native aerial video mosaic framework")
    sub = p.add_subparsers(dest="cmd")

    m = sub.add_parser("mosaic", help="stitch a video into a mosaic (default command)")
    m.add_argument("video_path", nargs="?", default=None)
    m.add_argument("--images-dir", default=None)
    m.add_argument("--output-dir", default=None)
    m.add_argument("--hide", action="store_true", help="disable intermediate windows")
    m.add_argument("--detector", default="sift", choices=["sift", "orb"])
    m.add_argument("--no-detect", action="store_true")
    m.add_argument("--no-nav", action="store_true")
    m.add_argument("--max-frames", type=int, default=None)
    m.add_argument("--window", type=int, default=None, help="frames per jitted step")
    m.add_argument("--per-frame-detect", action="store_true",
                   help="run batched YOLO on every frame and export Detections/")

    s = sub.add_parser("slam", help="visual odometry / SLAM on a video")
    s.add_argument("video_path", nargs="?", default=None)
    s.add_argument("--webcam", action="store_true")
    s.add_argument("--output-dir", default="test_output")
    s.add_argument("--max-frames", type=int, default=None)
    s.add_argument("--viz-3d", action="store_true", help="render trajectory PNG after run")

    d = sub.add_parser("depth3d", help="monocular depth -> 3D reconstruction")
    d.add_argument("input", help="video file, image file, or directory of images")
    d.add_argument("--model", default="depth-anything-small")
    d.add_argument("--output-dir", default=None)
    d.add_argument("--single-frame", action="store_true")
    d.add_argument("--multi-view", action="store_true")
    d.add_argument("--angle-mode", default="auto", choices=["auto", "uniform", "manual"])
    d.add_argument("--frame-step", type=int, default=30)
    d.add_argument("--max-frames", type=int, default=8)

    t = sub.add_parser("terrain", help="terrain / soil analysis of an image")
    t.add_argument("image")
    t.add_argument("--output", default=None)
    t.add_argument("--reconstruct-3d", action="store_true")
    t.add_argument("--model", default="depth-anything-small")
    t.add_argument("--depth-scale", type=float, default=10.0)
    t.add_argument("--fast", action="store_true")
    t.add_argument("--no-vis", action="store_true")

    sd = sub.add_parser("stereo-demo", help="synthetic stereo depth demo")
    sd.add_argument("--output-dir", default=".")

    v = sub.add_parser("view", help="render a .ply/.obj to PNG")
    v.add_argument("path")
    v.add_argument("--out", default=None)
    v.add_argument("--backend", choices=["auto", "matplotlib", "offscreen"], default="auto",
                   help="offscreen = jitted z-buffer rasterizer at --size")
    v.add_argument("--size", default="1920x1080",
                   help="offscreen render size WxH (reference default 1920x1080)")

    w = sub.add_parser("web", help="start the web UI")
    w.add_argument("--host", default="127.0.0.1")
    w.add_argument("--port", type=int, default=5000)

    sub.add_parser("gui", help="start the desktop GUI")
    sub.add_parser("menu", help="interactive text menu (reference-style)")
    return p


def main(argv=None):
    # honor the RTVM_PLATFORM config-layer pin + persistent compile cache
    # before any jax import triggers backend discovery (a wedged axon tunnel
    # otherwise hangs every CLI run ~25 min — NOTES_ROUND3.md finding 17)
    from rtvm_tpu.utils.platform import pin_and_cache

    pin_and_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    # reference-compat: `rtvm <video.mp4>` with no subcommand = mosaic
    known = {"mosaic", "slam", "depth3d", "terrain", "stereo-demo", "view", "web", "gui", "menu", "-h", "--help"}
    if argv and argv[0] not in known:
        argv = ["mosaic"] + argv
    elif not argv:
        argv = ["mosaic"]
    args = build_parser().parse_args(argv)

    if args.cmd == "mosaic":
        import dataclasses

        from rtvm_tpu.config import MosaicConfig, PipelineConfig
        from rtvm_tpu.pipelines.mosaic_pipeline import main as run

        mc = MosaicConfig()
        if args.window:
            mc = dataclasses.replace(mc, window_size=args.window)
        cfg = PipelineConfig(mosaic=mc)
        run(
            video_path=args.video_path,
            images_dir=args.images_dir,
            output_dir=args.output_dir,
            show_intermediate=not args.hide,
            detector_type=args.detector,
            enable_detection=not args.no_detect,
            enable_navigation=not args.no_nav,
            per_frame_detection=args.per_frame_detect,
            config=cfg,
            max_frames=args.max_frames,
        )
    elif args.cmd == "slam":
        from rtvm_tpu.slam.runner import run_slam_on_video, run_slam_webcam, visualize_trajectory_3d

        if args.webcam:
            run_slam_webcam()
        else:
            from rtvm_tpu.pipelines.mosaic_pipeline import DEFAULT_VIDEO

            _, traj = run_slam_on_video(
                args.video_path or DEFAULT_VIDEO, args.output_dir, max_frames=args.max_frames
            )
            if args.viz_3d:
                import os

                print(visualize_trajectory_3d(os.path.join(args.output_dir, "slam_trajectory_final.npy")))
    elif args.cmd == "depth3d":
        import os

        from rtvm_tpu.depth3d.pipeline import (
            process_multiple_images_to_3d,
            process_single_image,
            process_video_to_3d_model,
        )

        if os.path.isdir(args.input) or args.multi_view:
            import glob

            paths = sorted(
                glob.glob(os.path.join(args.input, "*.jpg")) + glob.glob(os.path.join(args.input, "*.png"))
            ) if os.path.isdir(args.input) else [args.input]
            process_multiple_images_to_3d(paths, args.output_dir, args.model, args.angle_mode)
        elif args.input.lower().endswith((".jpg", ".png", ".jpeg")):
            process_single_image(args.input, args.output_dir, args.model)
        else:
            process_video_to_3d_model(
                args.input, args.output_dir, args.model,
                frame_step=args.frame_step, max_frames=args.max_frames,
                single_frame=args.single_frame,
            )
    elif args.cmd == "terrain":
        import cv2

        from rtvm_tpu.slam.terrain import TerrainSoilAnalyzer

        img = cv2.imread(args.image)
        if img is None:
            sys.exit(f"cannot read image: {args.image}")
        analyzer = TerrainSoilAnalyzer()
        res = analyzer.analyze_image(img)
        print(analyzer.report(res))
        out = args.output or "terrain_analysis.jpg"
        cv2.imwrite(out, analyzer.visualize(img, res))
        print(f"Визуализация: {out}")
        if args.reconstruct_3d:
            from rtvm_tpu.depth3d.pipeline import ImageTerrainReconstructor

            r = ImageTerrainReconstructor(args.model, args.depth_scale, fast=args.fast)
            print(r.process(args.image, visualize=not args.no_vis))
    elif args.cmd == "stereo-demo":
        import os

        import cv2

        from rtvm_tpu.stereo.depth import StereoDepthEstimator, demo_stereo_depth

        left, right, disp = demo_stereo_depth()
        est = StereoDepthEstimator(num_disparities=32)
        os.makedirs(args.output_dir, exist_ok=True)
        cv2.imwrite(os.path.join(args.output_dir, "stereo_left.png"), left)
        cv2.imwrite(os.path.join(args.output_dir, "stereo_disparity.png"), est.colorize_disparity(disp))
        v = disp[disp > 0]
        print(f"Диспаритет: медиана {float(np.median(v)):.1f}px, валидных {len(v)}")
    elif args.cmd == "view":
        backend = args.backend
        if backend == "auto":
            # matplotlib scatter degrades (and slows) past ~150k points; large
            # artifacts go to the rasterizer, small ones keep the familiar plot
            try:
                from rtvm_tpu.io.ply import read_obj_mesh, read_ply_points

                n = (len(read_obj_mesh(args.path)[0]) if args.path.endswith(".obj")
                     else len(read_ply_points(args.path)[0]))
                backend = "offscreen" if n > 150_000 else "matplotlib"
            except Exception:
                backend = "matplotlib"
        if backend == "offscreen":
            from rtvm_tpu.viz.render import render_offscreen

            try:
                w, h = (int(x) for x in args.size.lower().split("x"))
            except ValueError:
                build_parser().error(f"--size must look like 1920x1080, got {args.size!r}")
            out = render_offscreen(args.path, args.out, width=w, height=h)
        else:
            from rtvm_tpu.viz.pointcloud_viewer import view_matplotlib, view_mesh_matplotlib

            out = (view_mesh_matplotlib if args.path.endswith(".obj") else view_matplotlib)(
                args.path, args.out
            )
        print(out)
    elif args.cmd == "web":
        sys.path.insert(0, "ui")
        from ui.web_app import main as web_main

        web_main(args.host, args.port)
    elif args.cmd == "gui":
        from ui.gui import main as gui_main

        gui_main()
    elif args.cmd == "menu":
        from rtvm_tpu.menus import main_menu

        main_menu()


import numpy as np  # noqa: E402  (stereo-demo uses it)

if __name__ == "__main__":
    main()
