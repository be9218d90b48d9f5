"""Observability: per-stage timings, throughput counters, device traces.

The reference's only instrumentation is an fps print with vsync off
(`project.godot:21,25`; SURVEY.md §5). Here: a `StageTimer` with explicit
`jax.block_until_ready` fencing for honest per-stage wall-clock (async
dispatch otherwise under-reports), ray-throughput counters, and a thin
wrapper over `jax.profiler` for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


class StageTimer:
    """Accumulates fenced wall-clock per named stage plus ray counters.

    Usage:
        timer = StageTimer()
        with timer.stage("tile_update", rays=96 * 96):
            out = engine.update_sky()   # timed with device fencing
        print(timer.report())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.rays: Dict[str, int] = defaultdict(int)
        self._result: Any = None

    @contextlib.contextmanager
    def stage(self, name: str, rays: int = 0, fence: Any = None):
        """Time a stage; fences `fence` (or nothing) with block_until_ready
        before stopping the clock."""
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if fence is not None:
                jax.block_until_ready(fence)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.rays[name] += rays

    def fence(self, value: Any) -> Any:
        """Explicit fence helper for use inside a stage block."""
        return jax.block_until_ready(value)

    def mrays_per_sec(self, name: str) -> Optional[float]:
        if self.totals[name] <= 0 or self.rays[name] == 0:
            return None
        return self.rays[name] / self.totals[name] / 1e6

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            total_ms = self.totals[name] * 1e3
            n = self.counts[name]
            line = f"{name:24s} {total_ms:9.2f} ms  ({n}x, {total_ms / n:8.3f} ms/call"
            mr = self.mrays_per_sec(name)
            if mr is not None:
                line += f", {mr:8.2f} Mrays/s"
            lines.append(line + ")")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "calls": self.counts[name],
                "mrays_per_sec": self.mrays_per_sec(name) or 0.0,
            }
            for name in self.totals
        }


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
