"""Stage timers + EMA FPS — the reference's ad-hoc tracing, systematised.

The reference instruments every stage with wall-clock timers and an EMA FPS
(``software/realtime_detect.py:324-363,601-602``, ``arm_benchmark.py:227-242``).
Equivalent here, plus an optional jax.profiler trace context for real TPU
profiling.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return (self.totals[name] / n * 1e3) if n else 0.0

    def report(self) -> str:
        return " | ".join(
            f"{k}:{self.mean_ms(k):.2f}ms(x{self.counts[k]})" for k in self.totals
        )


class EmaFps:
    """Exponential-moving-average FPS (alpha matches the reference's 0.8/0.2)."""

    def __init__(self, alpha: float = 0.8):
        self.alpha = alpha
        self.value = 0.0
        self._last = None

    def tick(self) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            fps = 1.0 / dt if dt > 0 else 0.0
            self.value = self.alpha * self.value + (1 - self.alpha) * fps
        self._last = now
        return self.value


@contextlib.contextmanager
def jax_trace(log_dir: str | None):
    """Optional jax.profiler trace (TPU timeline) around a block."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
