"""Profiling helpers (reference has none — SURVEY.md §5.1; we add the
TPU-native equivalents: jax.profiler traces + block_until_ready-bracketed
step timing for the captions/sec/chip headline metric)."""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Wall-clock timing with device-sync barriers; keeps a warmup skip so
    compile time never pollutes throughput numbers."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._n = 0

    @contextlib.contextmanager
    def measure(self, result_to_block=None):
        t0 = time.perf_counter()
        yield
        if result_to_block is not None:
            jax.block_until_ready(result_to_block)
        dt = time.perf_counter() - t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)

    def block_and_record(self, result) -> None:
        jax.block_until_ready(result)

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")


@contextlib.contextmanager
def trace_context(log_dir: str | None):
    """jax.profiler trace wrapper (view in TensorBoard/Perfetto)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
