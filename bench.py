"""Headline benchmark: end-to-end stitched frames/sec on the bundled 360p drone clip.

Run on one TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

Baseline: the reference's published CPU throughput for 360p mosaicking is ~10-15 fps
(reference README_EN.md:361-362); vs_baseline uses the 12.5 fps midpoint.
"""

import json
import os
import sys
import time

VIDEO = "/root/reference/Data/поиски квадрокоптера 2 (360p) 01.mp4"
BASELINE_FPS = 12.5


def main():
    t_start = time.time()
    from rtvm_tpu.config import MosaicConfig
    from rtvm_tpu.pipelines.mosaic_pipeline import run_mosaic

    detector = os.environ.get("BENCH_DETECTOR", "orb")
    window = int(os.environ.get("BENCH_WINDOW", "16"))
    cfg = MosaicConfig(window_size=window)

    # Warm-up pass on a short prefix so compile time is excluded from the measurement.
    run_mosaic(VIDEO, config=cfg, detector_type=detector, max_frames=window * 2 + 1)

    mosaic, stats = run_mosaic(VIDEO, config=cfg, detector_type=detector)

    out = {
        "metric": f"stitch_fps_360p_{detector}",
        "value": round(stats["fps"], 2),
        "unit": "fps",
        "vs_baseline": round(stats["fps"] / BASELINE_FPS, 2),
        "frames": stats["frames"],
        "accepted": stats["accepted"],
        "wall_s": round(time.time() - t_start, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
