"""Profiling / tracing hooks (a green field vs the reference's ad-hoc
time.time() fps prints, SURVEY.md §5): jax.profiler trace capture around
chosen steps + lightweight per-phase wall timers."""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall time per named phase; device-sync on exit."""

    def __init__(self, sync: bool = True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        yield
        if self.sync:
            jax.block_until_ready(jax.numpy.zeros(()))
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self):
        return {
            k: {"total_s": v, "count": self.counts[k], "mean_s": v / self.counts[k]}
            for k, v in self.totals.items()
        }


class ProfilerHook:
    """Captures a jax.profiler trace for steps [start, start+num_steps)."""

    def __init__(self, output_dir: str, start_step: int = 10, num_steps: int = 3):
        self.dir = os.path.join(output_dir, "profile")
        self.start = start_step
        self.stop = start_step + num_steps
        self._active = False

    def before_step(self, step: int):
        if step == self.start and not self._active:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self._active = True

    def after_step(self, step: int):
        if self._active and step + 1 >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
