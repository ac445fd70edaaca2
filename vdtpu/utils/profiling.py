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


def summarize_trace(log_dir: str, top: int = 20) -> dict[str, float]:
    """Aggregate a captured trace's device ops by class -> ms totals.

    Reads the trace.json.gz written by `trace()`; this is how the UNet step
    breakdown in PERF.md was produced.
    """
    import collections
    import glob
    import gzip
    import json
    import re

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/[a-z]*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    data = json.loads(gzip.open(paths[-1]).read())
    events = data.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_names.items() if "TPU" in n or "device" in n}
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            name = e.get("name", "")
            if name.startswith("jit_"):
                continue
            cls = re.sub(r"[.\d]+$", "", name)
            dur[cls] += e.get("dur", 0)
    return {k: v / 1000.0 for k, v in dur.most_common(top)}
