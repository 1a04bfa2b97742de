"""Metrics / logging / observability
(reference: SummaryWriter + print-everywhere, Pretrain.py:79-85,248-291;
component losses printed from inside the loss fn, MobileNetV2.py:488-531).

TPU redesign: nothing prints inside jitted code. The train step returns a
metrics dict of device scalars; the writer drains them on the host —
to TensorBoard when available, and always to a ``metrics.jsonl`` mirror
(the reference's log.txt, structured). Throughput (imgs/sec/chip, the
BASELINE headline metric) is computed from ``block_until_ready``-bracketed
wall clock.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Mapping, Optional

import numpy as np

import jax


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Mapping[str, Any]) -> None:
        host = {
            k: float(np.asarray(v)) for k, v in metrics.items()
        }
        self._jsonl.write(json.dumps({"step": int(step), **host}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in host.items():
                self._tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Throughput:
    """imgs/sec over a window, bracketed by block_until_ready
    (the reference computes the same metric from wall deltas every 200
    batches, Pretrain.py:266)."""

    def __init__(self):
        self._t0 = None
        self._images = 0

    def start(self, sync: Any = None):
        if sync is not None:
            jax.block_until_ready(sync)
        self._t0 = time.perf_counter()
        self._images = 0

    def count(self, n: int):
        self._images += n

    def rate(self, sync: Any = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._t0
        return self._images / dt if dt > 0 else float("inf")


class NaNMonitor:
    """Optional debug aid (the aux-subsystem 'race detection/sanitizer'
    slot, SURVEY.md §5): checks a metrics dict for NaN/Inf on the host and
    raises with the offending keys. Zero cost inside jit — it only reads
    values already returned."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def check(self, step: int, metrics: Mapping[str, Any]) -> None:
        if not self.enabled:
            return
        bad = [
            k for k, v in metrics.items() if not np.isfinite(float(np.asarray(v)))
        ]
        if bad:
            raise FloatingPointError(
                f"non-finite metrics at step {step}: {bad}"
            )
