"""Tracing/profiling hooks (SURVEY.md §5: the reference had none).

Stage timers aggregate wall time per pipeline stage; ``jax_trace`` wraps a
block in the JAX profiler for TensorBoard-viewable device traces.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimers:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "calls": self.counts[k],
                "mean_ms": round(1000 * self.totals[k] / max(self.counts[k], 1), 3),
            }
            for k in sorted(self.totals, key=lambda k: -self.totals[k])
        }


TIMERS = StageTimers()


@contextlib.contextmanager
def jax_trace(log_dir: str | None = None) -> Iterator[None]:
    """Device-level profiler trace (view with TensorBoard)."""
    import jax

    log_dir = log_dir or os.environ.get("SYNAPTA_TRACE_DIR", "/tmp/synapta_trace")
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
