"""Stall-watchdog launcher for long-running trainers on the tunneled TPU.

Round-5 post-mortem (NOTES_ROUND5 "Depth training blocked"): the axon remote
compile service intermittently hangs FOREVER on a train-step compile — the
same program that froze three trainer launches compiled in 29 s on a later
attempt — and a hung compile wedges the tunnel for every other process until
the trainer is killed. The persistent jax compilation cache does not cover
axon compiles (identical probe shapes recompiled 48-61 s within 30 min), so
a warm-compile subprocess cannot pre-seed anything: the only effective
mitigation is to kill the whole process and re-roll the dice in a fresh one.

This launcher runs any `python -m <module> ...` trainer, watches its log for
output progress, and kills + restarts it when the log stalls longer than
--stall-timeout. Trainers that checkpoint + auto-resume (both in-repo
trainers do) lose at most the un-checkpointed tail.

Usage:
    python tools/train_watchdog.py --stall-timeout 420 --retries 4 \
        --log /tmp/depth.log -- \
        python -m rtvm_tpu.models.train_depth --steps 8000 --init weights/depthnet.npz
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time


def run_with_watchdog(cmd, log_path, stall_timeout=420.0, retries=4,
                      poll_s=10.0) -> int:
    """Run cmd, restarting it whenever its log file stops growing for
    stall_timeout seconds. Returns the final exit code (0 on success)."""
    for attempt in range(1, retries + 1):
        with open(log_path, "ab", buffering=0) as log:
            log.write(f"[watchdog] attempt {attempt}/{retries}: {' '.join(cmd)}\n"
                      .encode())
            proc = subprocess.Popen(cmd, stdout=log, stderr=log)
        last_size = -1
        last_change = time.time()
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    return 0
                break  # crashed: retry
            size = os.path.getsize(log_path)
            if size != last_size:
                last_size, last_change = size, time.time()
            elif time.time() - last_change > stall_timeout:
                stalled = True
                proc.kill()
                try:
                    proc.wait(timeout=30)
                except subprocess.TimeoutExpired:
                    pass
                break
            time.sleep(poll_s)
        with open(log_path, "ab", buffering=0) as log:
            log.write((f"[watchdog] attempt {attempt} "
                       f"{'stalled' if stalled else f'exited rc={proc.returncode}'}; "
                       f"{'retrying' if attempt < retries else 'giving up'}\n")
                      .encode())
    return 1


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stall-timeout", type=float, default=420.0,
                    help="seconds without log growth before kill+restart")
    ap.add_argument("--retries", type=int, default=4)
    ap.add_argument("--log", required=True, help="trainer stdout/stderr log path")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the trainer command line")
    a = ap.parse_args(argv)
    cmd = a.cmd[1:] if a.cmd and a.cmd[0] == "--" else a.cmd
    if not cmd:
        ap.error("no trainer command given (append: -- python -m ...)")
    rc = run_with_watchdog(cmd, a.log, a.stall_timeout, a.retries)
    print(f"watchdog: {'success' if rc == 0 else 'FAILED after retries'}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
