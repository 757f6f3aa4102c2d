"""Chunk-size grid search for the fused clip bench (run when the TPU tunnel
is healthy).

The fused dispatch must stay under the tunnel governor's ~300 ms latch
threshold (NOTES_ROUND3.md finding 15), so the best windows-per-dispatch
value depends on the per-window device time of each config. This driver
sweeps BENCH_CHUNK for configs 1/2/3 in fresh subprocesses (one per probe,
governor latch is process-sticky) and prints the per-config winner as JSON.

    python tools/bench_grid.py [config_ids] [chunks]
    python tools/bench_grid.py 1,2,3 3,4,6,8
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe(cid: str, chunk: int, frames: int = 300, timeout: int = 900):
    env = dict(os.environ, BENCH_CONFIG=cid, BENCH_CHUNK=str(chunk),
               BENCH_FRAMES=str(frames))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py"), "--device-probe"],
            capture_output=True, text=True, timeout=timeout, env=env, cwd=ROOT,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        return json.loads(lines[-1]) if lines else None
    except Exception:
        return None


def main():
    cids = (sys.argv[1] if len(sys.argv) > 1 else "1,2,3").split(",")
    chunks = [int(c) for c in (sys.argv[2] if len(sys.argv) > 2 else "3,4,6,8").split(",")]
    best = {}
    for cid in cids:
        rows = []
        for ch in chunks:
            r = probe(cid, ch)
            if r:
                rows.append(r)
                print(json.dumps(r), flush=True)
            time.sleep(20)  # let any governor latch decay between probes
        if rows:
            best[cid] = max(rows, key=lambda r: r.get("blocked_fps", 0))
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
