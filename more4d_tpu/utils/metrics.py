"""Scalar metrics logging for the trainers.

The reference logs train_loss through accelerate's TensorBoard tracker
(train_wan.py:722-723, 2025) plus optional per-parameter grad-norm
histograms (:2003-2012). Here: an append-only JSONL stream (always on —
machine-readable loss curves for CI and plotting) with an optional
TensorBoard mirror when tensorboardX is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, output_dir: str, name: str = "metrics",
                 use_tensorboard: bool = True):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(
                    os.path.join(output_dir, "tensorboard"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: Optional[str] = None) -> None:
        clean = {}
        for k, v in scalars.items():
            key = f"{prefix}/{k}" if prefix else k
            try:
                clean[key] = float(v)
            except (TypeError, ValueError):
                continue
        rec = {"step": int(step), "time": time.time(), **clean}
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
