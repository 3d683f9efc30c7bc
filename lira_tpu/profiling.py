"""Tracing / profiling utilities.

The reference's observability is wall-clock prints only (SURVEY.md §5);
here stage timers (logging_utils.stage_timer) are complemented by real
device profiling via jax.profiler, plus the per-query ndis/nprobe counters
that the engines emit as first-class result fields.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field


@contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard format) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StageStats:
    """Accumulates named stage wall times across a pipeline run."""

    times: dict = field(default_factory=dict)

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            # record on exceptions too: otherwise report() silently
            # attributes 100% of wall time to the stages that succeeded
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [f"{name}: {t:.3f}s ({100 * t / total:.1f}%)" for name, t in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)
