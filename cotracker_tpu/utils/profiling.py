"""Profiling surface: jax.profiler traces + per-stage timers.

The reference has no profiling beyond whole-run wall time
(evaluate.py:159-166); the north-star metric here is points*frames/sec/chip
(SURVEY.md §5), so tracing is first-class.
"""

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating block_until_ready wall-clock timers.

    with timer.stage("corr"):
        out = corr_fn(...)   # synchronized on exit
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            lines.append(
                f"{k}: {self.totals[k] * 1000:.1f} ms total, "
                f"{self.totals[k] / max(self.counts[k], 1) * 1000:.2f} ms/call x{self.counts[k]}"
            )
        return "\n".join(lines)


def points_frames_per_sec(n_points: int, n_frames: int, seconds: float) -> float:
    """The north-star throughput metric."""
    return n_points * n_frames / max(seconds, 1e-9)
