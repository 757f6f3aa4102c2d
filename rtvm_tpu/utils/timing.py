"""Per-stage timing + observability (SURVEY.md section 5: the reference has none
beyond an FPS overlay; this adds real stage timers, span recording, and a
Chrome-trace exporter).

`jax.profiler.trace` wedges the axon tunnel for hours (round-1 platform
finding), so device-level traces are off the table here; the host-side span
recorder below is the supported tracing path — every `stage()` interval is kept as a
(name, t0, dt, thread) span and can be exported as a Chrome trace-event JSON
(`chrome://tracing` / Perfetto "load trace") via `write_chrome_trace`.
"""

from __future__ import annotations

import contextlib
import json
import threading
import time
from collections import defaultdict
from typing import Dict, List, Tuple

import jax


class StageTimer:
    """Aggregating stage timer + span recorder.

    Aggregates (totals/counts) drive the human report; raw spans (bounded ring,
    default 100k) drive the Chrome-trace export. Thread-safe: UI frontends time
    worker-thread stages while the main thread reports (SURVEY §5 race-safety).
    """

    def __init__(self, max_spans: int = 100_000):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.spans: List[Tuple[str, float, float, int]] = []  # (name, t0, dt, tid)
        self._max_spans = max_spans
        self._lock = threading.Lock()
        self._epoch = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        yield
        if sync:
            jax.block_until_ready(jax.device_put(0))
        dt = time.perf_counter() - t0
        with self._lock:
            self.totals[name] += dt
            self.counts[name] += 1
            if len(self.spans) < self._max_spans:
                self.spans.append((name, t0 - self._epoch, dt, threading.get_ident()))

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} total {total*1e3:9.1f} ms  n={n:5d}  avg {total/n*1e3:8.2f} ms")
        return "\n".join(lines)

    def write_chrome_trace(self, path: str, process_name: str = "rtvm_tpu") -> str:
        """Write recorded spans as Chrome trace-event JSON (complete 'X' events,
        microsecond timestamps). Loadable in chrome://tracing and Perfetto —
        the host-side stand-in for jax.profiler device traces (tunnel-lethal
        on this platform)."""
        with self._lock:
            spans = list(self.spans)
        events = [{
            "name": "process_name", "ph": "M", "pid": 1, "tid": 0,
            "args": {"name": process_name},
        }]
        for name, t0, dt, tid in spans:
            events.append({
                "name": name, "ph": "X", "pid": 1, "tid": tid % 2**31,
                "ts": round(t0 * 1e6, 1), "dur": round(dt * 1e6, 1), "cat": "stage",
            })
        with open(path, "w") as f:
            json.dump({"traceEvents": events, "displayTimeUnit": "ms"}, f)
        return path


@contextlib.contextmanager
def jax_profile(logdir: str | None):
    """Wrap a region in jax.profiler tracing when a logdir is given.

    WARNING: on the axon-tunneled TPU this wedges the tunnel (platform
    finding); prefer StageTimer.write_chrome_trace for host-side spans."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
