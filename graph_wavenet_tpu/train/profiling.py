"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints around epochs
(`/root/reference/train.py:153,171-172,207-208`; SURVEY.md §5). TPU-native
replacements:

- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (XLA op breakdown, HBM usage);
- :class:`StepTimer` — ``block_until_ready``-disciplined step timing with
  summary percentiles;
- :func:`log_compile_time` — first-call compile-time measurement for a
  jitted fn.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context: profiles everything inside."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class StepTimer:
    """Wall-clock step timer with device-sync discipline.

    Call ``start()`` once, then ``tick(leaf)`` after each step; ``leaf`` is
    any output array of the step — it is block_until_ready'd so the
    measured interval covers the device work, not just dispatch.
    """

    times: list = field(default_factory=list)
    _t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()

    def tick(self, leaf=None):
        if leaf is not None:
            jax.block_until_ready(leaf)
        now = time.perf_counter()
        if self._t0 is not None:
            self.times.append(now - self._t0)
        self._t0 = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_s": float(1.0 / t.mean()),
        }


def log_compile_time(fn, *args, **kwargs):
    """Measure (compile+run, steady-run) wall times of a jitted fn."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    steady = time.perf_counter() - t0
    return {"first_call_s": compile_and_run, "steady_call_s": steady,
            "compile_overhead_s": compile_and_run - steady}
