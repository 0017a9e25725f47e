"""Profiling and timing utilities.

The reference has no profiler integration (SURVEY.md §5.1); here tracing is a
first-class, config-reachable feature: ``trainer.profile_steps`` captures an
XLA/TPU trace of a step window viewable in XProf/TensorBoard, and
``time_fn`` gives dispatch-safe wall timings via ``block_until_ready``.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path):
    """Capture a jax.profiler trace into ``log_dir``."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> dict:
    """Wall-time a jitted function with proper device synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return {"mean_ms": 1e3 * elapsed / iters, "iters": iters}


class StepWindowProfiler:
    """Trace a window of training steps (e.g. steps 10..14) once."""

    def __init__(self, log_dir: str | Path, start_step: int = 10, num_steps: int = 5):
        self.log_dir = Path(log_dir)
        self.start_step = start_step
        self.end_step = start_step + num_steps
        self._active = False
        self._done = False

    def on_step(self, step: int) -> None:
        if self._done:
            return
        if not self._active and step >= self.start_step:
            jax.profiler.start_trace(str(self.log_dir))
            self._active = True
        elif self._active and step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
