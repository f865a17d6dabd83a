"""Profiling helpers.

Reference analogues (SURVEY.md §5 "Tracing / profiling"):
- ``PerformanceMarker`` RAII GPU scopes around each DX11 pass →
  :class:`StageTimings` named scopes (with ``block_until_ready`` so the
  measured span covers actual device work, not dispatch).
- 8-frame moving-average FPS in the window title
  (``SimpleViewer/main.cpp:72-88``) → :class:`FrameTimer`.
- RenderDoc/PIX capture → :func:`device_trace`, a context manager around
  ``jax.profiler`` emitting an XLA trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict, deque

import jax


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace of everything inside the scope."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimings:
    """Named wall-clock scopes with device synchronization.

    >>> timings = StageTimings()
    >>> with timings.scope("trace", result):   # blocks on result
    ...     pass
    Accumulates total seconds and call counts per stage; ``report()``
    renders a fixed-width summary (the renderer's "G-buffer / SSAO / ..."
    marker hierarchy flattened to stage names).
    """

    def __init__(self):
        self._acc = OrderedDict()

    @contextlib.contextmanager
    def scope(self, name: str, *block_on):
        t0 = time.perf_counter()
        # Also annotate the XLA trace when one is active.
        with jax.profiler.TraceAnnotation(name):
            yield
            for x in block_on:
                jax.block_until_ready(x)
        dt = time.perf_counter() - t0
        total, count = self._acc.get(name, (0.0, 0))
        self._acc[name] = (total + dt, count + 1)

    def timings(self):
        """{name: (total_seconds, call_count)}."""
        return dict(self._acc)

    def report(self) -> str:
        lines = ["stage                     total_s    calls   ms/call"]
        for name, (total, count) in self._acc.items():
            lines.append(
                f"{name:<24} {total:>8.3f} {count:>8d} {1e3 * total / count:>9.3f}")
        return "\n".join(lines)

    def reset(self):
        self._acc.clear()


class FrameTimer:
    """Moving-average FPS over the last N frames (default 8, like the
    SimpleViewer title bar)."""

    def __init__(self, window: int = 8):
        self._times = deque(maxlen=window + 1)

    def tick(self, now: float = None):
        self._times.append(time.perf_counter() if now is None else now)

    @property
    def fps(self) -> float:
        if len(self._times) < 2:
            return 0.0
        span = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / span if span > 0 else 0.0
