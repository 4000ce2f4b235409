"""Profiling / tracing hooks (TPU-build addition).

The reference has no profiling beyond tqdm batch timing (SURVEY.md §5).
Here: jax.profiler trace capture around arbitrary code regions and a
lightweight per-step timer that reports steady-state step latency and
throughput.
"""

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir="runs/profile"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with warmup discard."""

    def __init__(self, warmup=2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)

    @property
    def mean(self):
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def throughput(self, items_per_step):
        return items_per_step / self.mean
