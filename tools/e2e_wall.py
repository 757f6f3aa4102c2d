"""End-to-end WALL-clock fps: windowed vs fused-chunked on the same clip
(VERDICT r4 item 6). Unlike bench.py's burst protocol (pure device time, one
dispatch), this measures what a user sees: decode + dispatch + host overhead,
with the round-4 decode/dispatch overlap active on the fused path.

The r2 baseline to beat is 18.24 wall fps; the reference does 10-15 fps on a
CPU (README_EN.md:361). On the tunneled chip the governor throttles sustained
execution (~10% duty after ~0.7 s), so chip wall numbers are a LOWER bound on
untethered-chip wall throughput; RTVM_PLATFORM=cpu gives the tunnel-free
comparison.

Usage:
    [RTVM_PLATFORM=cpu] python tools/e2e_wall.py [n_frames] [detector]
Prints one JSON line per mode and writes artifacts/round5/e2e_wall.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
VIDEO = os.path.join(
    "/root/reference/Data", "поиски квадрокоптера 2 (360p) 01.mp4"
)


def _one(mode: str, n_frames: int, detector: str) -> dict:
    """Run one pipeline pass in a fresh subprocess (own jit cache, honest wall)."""
    code = f"""
import json, sys, time
sys.path.insert(0, {ROOT!r})
from rtvm_tpu.utils.platform import pin_and_cache
pin_and_cache()
from rtvm_tpu.config import MosaicConfig
from rtvm_tpu.pipelines.mosaic_pipeline import run_mosaic
cfg = MosaicConfig()
t0 = time.perf_counter()
m, stats = run_mosaic({VIDEO!r}, config=cfg, detector_type={detector!r},
                      fused={mode == "fused"!r}, max_frames={n_frames})
stats["wall_s_incl_init"] = time.perf_counter() - t0
stats["mode"] = {mode!r}
print("RESULT " + json.dumps({{k: v for k, v in stats.items() if not hasattr(v, "shape")}}))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    return {"mode": mode, "error": (out.stderr or "no output")[-500:]}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    det = sys.argv[2] if len(sys.argv) > 2 else "sift"
    results = {}
    for mode in ("fused", "windowed"):
        results[mode] = _one(mode, n, det)
        print(json.dumps(results[mode]), flush=True)
    results["meta"] = {
        "n_frames": n, "detector": det,
        "platform": os.environ.get("RTVM_PLATFORM", "device"),
        "r2_baseline_wall_fps": 18.24,
        "reference_cpu_fps": "10-15 (README_EN.md:361)",
    }
    os.makedirs(os.path.join(ROOT, "artifacts/round5"), exist_ok=True)
    with open(os.path.join(ROOT, "artifacts/round5/e2e_wall.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"e2e_wall": {
        m: {"fps": results[m].get("fps"), "steady_fps": results[m].get("steady_fps")}
        for m in ("fused", "windowed")
    }}))


if __name__ == "__main__":
    main()
