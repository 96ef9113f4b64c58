"""Profiling: wall-clock spans + jax.profiler traces.

Replaces the reference's ad-hoc cuda-synchronize timing scaffolding
(SURVEY.md section 5.1) with structured spans (device-synchronized) and
one-call TensorBoard trace capture for kernel-level inspection.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Spans:
    """Accumulating named wall-clock spans (block_until_ready-fenced)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {'total_s': self.totals[name],
                       'count': self.counts[name],
                       'mean_ms': 1000 * self.totals[name]
                       / max(self.counts[name], 1)}
                for name in self.totals}


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context -> TensorBoard trace in ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
