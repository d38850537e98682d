"""Profiling / tracing helpers.

The reference's only instrumentation is wall-clock + peak memory around whole
runs (reference: run.py:7-9,212,228). TPU-native equivalents:

* `trace(dir)` — jax.profiler trace context (open in XProf/TensorBoard);
* `device_memory_stats()` — live/peak HBM;
* `StepTimer` — wall-clock stats with proper device sync.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["trace", "device_memory_stats", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None) -> dict:
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    if not stats:
        return {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
    }


class StepTimer:
    """Collects per-step wall times; `sync` must force a host roundtrip
    (e.g. ``lambda out: float(out[0])``)."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def step(self):
        t0 = time.time()
        yield
        self.times.append(time.time() - t0)

    def stats(self) -> dict:
        a = np.asarray(self.times)
        if not len(a):
            return {}
        return {
            "n": len(a),
            "median_s": float(np.median(a)),
            "mean_s": float(a.mean()),
            "p90_s": float(np.percentile(a, 90)),
            "total_s": float(a.sum()),
        }
