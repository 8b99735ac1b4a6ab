"""Tracing and per-step timing (SURVEY §5: the reference has only wall-clock
CSV columns — this framework provides real profiler integration).

* `profile_trace(dir)`: context manager around jax.profiler (XPlane/Perfetto
  dumps viewable in TensorBoard's profile plugin or ui.perfetto.dev).
* `StepTimer`: cheap wall-clock histogram of step latencies with throughput
  summaries (img/s, MP/s) — usable in production loops every step.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed block into `log_dir`."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates step wall-times; `summary()` reports latency + throughput."""

    def __init__(self, *, pixels_per_step: int | None = None,
                 items_per_step: int | None = None):
        self.pixels_per_step = pixels_per_step
        self.items_per_step = items_per_step
        self._durations: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._durations.append(time.perf_counter() - self._t0)
        self._t0 = None
        return False

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self._durations.append(dt)
        return dt

    @property
    def num_steps(self) -> int:
        return len(self._durations)

    def summary(self, *, skip_warmup: int = 1) -> dict:
        d = np.asarray(self._durations[skip_warmup:] or self._durations)
        out = {
            "steps": int(d.size),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p99_s": float(np.percentile(d, 99)),
        }
        if self.items_per_step:
            out["items_per_s"] = self.items_per_step / out["mean_s"]
        if self.pixels_per_step:
            out["megapixels_per_s"] = self.pixels_per_step / out["mean_s"] / 1e6
        return out

    def reset(self) -> None:
        self._durations.clear()
