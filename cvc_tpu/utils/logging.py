"""Metric logging: console + JSONL + optional TensorBoard.

The reference logs console prints + TensorBoard scalars (tensorboardX era;
reference: SummaryWriter usage in `main.py`; SURVEY.md §5.5).  We keep the
same observable surface — scalar curves + JSON artifacts — with a JSONL
file as the always-available machine-readable log.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: Optional[str] = None,
                 use_tensorboard: bool = True):
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self._tb = SummaryWriter(log_dir)
                except Exception:
                    self._tb = None

    def log(self, step: int, metrics: dict, prefix: str = "",
            to_console: bool = True) -> None:
        flat = {}
        for k, v in metrics.items():
            try:
                f = float(v)  # accepts python/numpy scalars and jax Arrays
            except (TypeError, ValueError):
                continue
            if f == f:  # drop NaNs
                flat[(prefix + "/" + k) if prefix else k] = f
        if to_console:
            msg = " ".join(f"{k}={v:.4f}" for k, v in flat.items())
            print(f"[step {step}] {msg}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps(
                {"step": step, "time": time.time(), **flat}) + "\n")
            self._jsonl.flush()
        if self._tb:
            for k, v in flat.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
