"""Tracing / profiling helpers (SURVEY §5 aux subsystems).

The reference leans on Lightning's ``profiler: simple`` and an elapsed-time
progress bar (``callbacks.py:229-246``); the TPU-native equivalents are
``jax.profiler`` traces (viewable in TensorBoard/Perfetto) and explicit
per-phase wall timers around ``block_until_ready`` boundaries.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace_to(log_dir: str | Path):
    """Capture a jax.profiler trace for the enclosed block."""
    log_dir = str(log_dir)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class phase_timer:
    """Accumulating per-phase wall timers.

    >>> timers = phase_timer()
    >>> with timers("data"):
    ...     batch = next(it)
    >>> with timers("step"):
    ...     out = step(batch); jax.block_until_ready(out)
    >>> timers.summary()
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(total, 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * total / self.counts[name], 3),
            }
            for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))
