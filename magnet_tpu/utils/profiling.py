"""Profiling and step-timing hooks.

The reference has no profiler integration (SURVEY.md section 5). Here:
``trace(logdir)`` wraps a block in a jax.profiler trace viewable in
TensorBoard/XProf, and ``StepTimer`` keeps a streaming steps/sec estimate
for the training loops.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class ProfileWindow:
    """Capture a device trace for steps [start, start+num) when a logdir
    is configured; no-op otherwise. Call tick() once per training step."""

    def __init__(self, logdir: str = "", start: int = 10, num: int = 3):
        self.logdir = logdir
        self.start = start
        self.stop = start + num
        self.count = 0
        self.active = False

    def tick(self):
        if not self.logdir:
            return
        if self.count == self.start:
            jax.profiler.start_trace(self.logdir)
            self.active = True
        elif self.count == self.stop and self.active:
            jax.profiler.stop_trace()
            self.active = False
            print(f"profile trace written to {self.logdir}", flush=True)
        self.count += 1

    def close(self):
        if self.active:
            jax.profiler.stop_trace()
            self.active = False


class StepTimer:
    """Streaming steps/sec with warmup exclusion (first N steps compile)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.t0 = None

    def tick(self) -> float:
        """Call once per step; returns current steps/sec (0 during
        warmup)."""
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
        if self.t0 is None or self.count <= self.warmup:
            return 0.0
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)
