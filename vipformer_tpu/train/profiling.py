"""Profiling helpers (the reference's tracing story is datetime.now()
deltas, SURVEY.md §5; here: real device traces + analytical costs)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with a device barrier per report interval.

    Avoids the reference's pattern of timing async dispatch
    (`pretrain.py:185-188` measures the enqueue, not the compute).
    """

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def step(self):
        self.steps += 1

    def report(self, barrier_on=None) -> float:
        """Seconds per step since start(); blocks on `barrier_on` first."""
        if barrier_on is not None:
            jax.block_until_ready(barrier_on)
        dt = time.perf_counter() - self.t0
        return dt / max(self.steps, 1)
