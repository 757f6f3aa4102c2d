"""tools/train_watchdog.py: the stall-watchdog launcher for tunneled-TPU
trainers (round-5 post-mortem: an intermittently hanging remote compile
service can freeze a trainer forever and wedge the tunnel; the only effective
mitigation is kill + fresh-process retry)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from train_watchdog import run_with_watchdog  # noqa: E402


def test_watchdog_kills_and_retries_stalled_process(tmp_path):
    log = str(tmp_path / "wd.log")
    rc = run_with_watchdog(
        [sys.executable, "-c", "import time; print('x', flush=True); time.sleep(999)"],
        log, stall_timeout=3, retries=2, poll_s=0.5,
    )
    assert rc == 1
    text = open(log).read()
    assert text.count("stalled") == 2  # both attempts killed on stall


def test_watchdog_passes_through_success(tmp_path):
    log = str(tmp_path / "wd.log")
    rc = run_with_watchdog(
        [sys.executable, "-c", "print('done', flush=True)"],
        log, stall_timeout=10, retries=2, poll_s=0.5,
    )
    assert rc == 0
    assert "done" in open(log).read()


def test_watchdog_retries_crash_then_gives_up(tmp_path):
    log = str(tmp_path / "wd.log")
    rc = run_with_watchdog(
        [sys.executable, "-c", "import sys; sys.exit(3)"],
        log, stall_timeout=10, retries=2, poll_s=0.5,
    )
    assert rc == 1
    assert "rc=3" in open(log).read()
