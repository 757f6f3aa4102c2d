"""Per-stage timing + observability (SURVEY.md section 5: the reference has none beyond
an FPS overlay; this adds real stage timers and jax.profiler hooks)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        yield
        if sync:
            jax.block_until_ready(jax.device_put(0))
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:24s} total {total*1e3:9.1f} ms  n={n:5d}  avg {total/n*1e3:8.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def jax_profile(logdir: str | None):
    """Wrap a region in jax.profiler tracing when a logdir is given."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
