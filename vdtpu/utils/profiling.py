"""Tracing / profiling utilities.

The reference has wall-clock timers only (`lib/utils.py:101,231-233`,
`log_service.py:129-130`) and an unused FLOPs hook; the TPU-native plan
(SURVEY.md section 5) is `jax.profiler` traces plus throughput counters.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up on the TraceMe timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """block_until_ready-aware wall timer."""

    def __init__(self):
        self.start = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        return time.perf_counter() - self.start


class ThroughputMeter:
    """Images/s / tokens/s style counters for step loops (reference's
    per-window `Time:` field, upgraded to rates)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._units = 0.0
        self._steps = 0

    def update(self, units: float):
        self._units += units
        self._steps += 1

    def rates(self) -> dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return {"units_per_sec": self._units / dt,
                "steps_per_sec": self._steps / dt,
                "window_sec": dt}


def device_memory_stats() -> dict[str, int]:
    """Per-device HBM usage where the backend reports it."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {k: v for k, v in stats.items()
                           if "bytes" in k}
    return out
