"""Logging / observability.

Capability parity with `/root/reference/lib/log_service.py`:
- `print_log`: console + optional logfile append (:15-36),
- `MetricAccumulator`: weighted loss sums with cross-host mean — the
  reference all_reduce (:69-82) becomes `multihost_utils.process_allgather`
  when running multi-process (single-controller JAX needs no collective for
  the common one-process-many-chips case),
- optional TensorBoard scalars namespaced loss/ eval/ other/ (:84-104).
"""
from __future__ import annotations

import os
import time
from typing import Mapping

_LOG_FILES: list[str] = []


def set_log_file(path: str | None):
    _LOG_FILES.clear()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        _LOG_FILES.append(path)


def _is_primary() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def print_log(*console_info):
    """Primary-process console print + logfile append (ref :15-36).

    A failed logfile append (run dir removed, disk full, stale registration
    from a finished run) drops the line rather than raising — a log write
    must never kill a training step."""
    if not _is_primary():
        return
    msg = " ".join(str(i) for i in console_info)
    print(msg)
    for f in _LOG_FILES:
        try:
            with open(f, "a") as fh:
                fh.write(msg + "\n")
        except OSError:
            pass


class MetricAccumulator:
    """Weighted running means of scalar metrics (ref distributed_log_manager)."""

    def __init__(self, tensorboard_dir: str | None = None):
        self.sums: dict[str, float] = {}
        self.weights: dict[str, float] = {}
        self.tb = None
        if tensorboard_dir is not None:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(tensorboard_dir)
            except ImportError:
                self.tb = None

    def accumulate(self, metrics: Mapping[str, float], weight: float = 1.0):
        for k, v in metrics.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * weight
            self.weights[k] = self.weights.get(k, 0.0) + weight

    def means(self) -> dict[str, float]:
        local = {k: self.sums[k] / max(self.weights[k], 1e-12) for k in self.sums}
        try:
            import jax
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                import numpy as np
                keys = sorted(local)
                vals = np.asarray([local[k] for k in keys])
                allv = multihost_utils.process_allgather(vals)
                local = {k: float(v) for k, v in zip(keys, allv.mean(axis=0))}
        except Exception:
            pass
        return local

    def summary(self) -> str:
        return " ".join(f"{k}:{v:.4f}" for k, v in sorted(self.means().items()))

    def tensorboard(self, step: int, namespace: str = "loss"):
        if self.tb is None:
            return
        for k, v in self.means().items():
            self.tb.add_scalar(f"{namespace}/{k}", v, step)

    def reset(self):
        self.sums.clear()
        self.weights.clear()
