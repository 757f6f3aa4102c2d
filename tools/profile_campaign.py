"""Unattended stage-profiling campaign on the tunneled TPU.

Runs each profile_fused.py stage in its OWN subprocess (fresh tunnel session),
spaced by idle gaps so every probe starts from a refilled governor bucket
(NOTES_ROUND3.md findings 15-17: the token bucket grants ~0.7 s of full-speed
device time and refills over minutes of idle; back-to-back probes read the
throttle, not the chip).

    python tools/profile_campaign.py [--wait-pid PID] [--idle 270] [--log PATH]

--wait-pid blocks until the given process (e.g. a running bench.py) exits,
then waits one extra idle gap before the first probe.
"""

import argparse
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

STAGES = [
    # (PROFILE_STAGES selector, reps arg)
    ("full step", "2"),  # 3 reps -> ~330 ms dispatch trips the ~300 ms governor latch
    ("features(all)", "3"),
    ("yolov8n", "3"),
    ("pyramid", "3"),
    ("pyr+detect", "3"),
    ("pyr+det+patches", "3"),
    ("match+ransac", "3"),
    ("match(15", "3"),
    ("pyr+extrema", "3"),
    ("pyr+ext+hessian", "3"),
    ("gray", "3"),
    # paint-path decomposition (round 4): warp tier vs weights vs full blend
    ("paint(pallas", "3"),
    ("warp(pallas", "3"),
    ("paint(two_pass", "3"),
    ("warp(two_pass", "3"),
    ("weights(frame+union", "3"),
    ("paint(batched-pallas", "3"),
    ("prescan(compose", "3"),
]


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait-pid", type=int, default=None)
    ap.add_argument("--idle", type=int, default=270)
    ap.add_argument("--log", default="/tmp/profile_campaign.log")
    ap.add_argument("--json", default=None,
                    help="also write parsed stage timings to this JSON file "
                         "(updated after every probe)")
    ap.add_argument("--only", default=None,
                    help="comma-separated substrings: run only matching stages")
    a = ap.parse_args()
    stages = STAGES
    if a.only:
        subs = [s for s in a.only.split(",") if s]
        stages = [st for st in STAGES if any(s in st[0] for s in subs)]

    import json
    import re

    rows = {}
    row_re = re.compile(
        r"^(.{1,24}?)\s+([\d.]+) ms/window \(\s*([\d.]+) ms/frame\)\s+"
        r"\[dispatch (\d+) ms / (\d+) reps\]"
    )

    if a.json and os.path.exists(a.json):
        try:
            with open(a.json) as fh:
                rows.update(json.load(fh).get("stages", {}))
        except Exception:
            pass

    def save_json():
        if not a.json:
            return
        os.makedirs(os.path.dirname(a.json) or ".", exist_ok=True)
        with open(a.json, "w") as fh:
            json.dump({
                "protocol": "scan-amortized stage timing, one stage per fresh "
                            "process, idle-spaced (see tools/profile_fused.py)",
                "platform": os.environ.get("RTVM_PLATFORM", "axon (tunneled TPU)"),
                "window": int(os.environ.get("PROFILE_WINDOW", "16")),
                "stages": rows,
            }, fh, indent=1)

    def log(msg):
        line = f"[{time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        with open(a.log, "a") as fh:
            fh.write(line + "\n")

    if a.wait_pid:
        log(f"waiting for pid {a.wait_pid} to exit")
        while pid_alive(a.wait_pid):
            time.sleep(20)
        log(f"pid {a.wait_pid} exited; idling {a.idle}s before first probe")
        time.sleep(a.idle)

    for i, (sel, reps) in enumerate(stages):
        if i:
            time.sleep(a.idle)
        env = dict(os.environ)
        env["PROFILE_STAGES"] = sel
        t0 = time.time()
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "profile_fused.py"), reps, "sift"],
                capture_output=True, text=True, timeout=900, env=env,
            )
            body = out.stdout.strip() or out.stderr.strip()[-400:]
        except subprocess.TimeoutExpired:
            body = "TIMEOUT (900s) — tunnel likely wedged"
        log(f"stage {sel!r} ({time.time() - t0:.0f}s):\n{body}")
        for line in body.splitlines():
            mt = row_re.match(line.strip())
            if mt:
                rows[mt.group(1).strip()] = {
                    "ms_per_window": float(mt.group(2)),
                    "ms_per_frame": float(mt.group(3)),
                    "dispatch_ms": int(mt.group(4)),
                    "reps": int(mt.group(5)),
                }
        save_json()

    log("campaign done")


if __name__ == "__main__":
    main()
