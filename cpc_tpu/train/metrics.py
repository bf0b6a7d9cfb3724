"""Metrics/observability (SURVEY.md §6.5).

The reference logs TensorBoard scalars (InfoNCE loss, per-k accuracy,
validation loss) via SummaryWriter. Here: the same scalar set goes to
  * stdout + `<workdir>/metrics.jsonl` as JSON lines (always), and
  * TensorBoard event files via CLU metric_writers when a workdir is given
    and tensorflow is importable (it is in this image; gated anyway).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


def _scalarize(v):
    a = np.asarray(v)
    if a.ndim == 0:
        return float(a)
    return [float(x) for x in a.ravel()]


class MetricWriter:
    def __init__(self, workdir: Optional[str] = None, use_tensorboard: bool = True,
                 echo: bool = True):
        self.workdir = workdir
        self.echo = echo
        self._jsonl = None
        self._tb = None
        if workdir:
            os.makedirs(workdir, exist_ok=True)
            self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a",
                               buffering=1)
            if use_tensorboard:
                try:
                    from clu import metric_writers
                    self._tb = metric_writers.SummaryWriter(
                        os.path.join(workdir, "tb"))
                except Exception:
                    self._tb = None

    def write(self, step: int, metrics: Dict, prefix: str = "train") -> None:
        rec = {"step": step, "time": time.time(), "prefix": prefix}
        rec.update({k: _scalarize(v) for k, v in metrics.items()})
        line = json.dumps(rec)
        if self.echo:
            print(line, flush=True)
        if self._jsonl:
            self._jsonl.write(line + "\n")
        if self._tb:
            flat = {}
            for k, v in metrics.items():
                a = np.asarray(v)
                if a.ndim == 0:
                    flat[f"{prefix}/{k}"] = float(a)
                else:
                    for i, x in enumerate(a.ravel()):
                        flat[f"{prefix}/{k}_{i+1}"] = float(x)
            self._tb.write_scalars(step, flat)

    def close(self) -> None:
        if self._jsonl:
            self._jsonl.close()
        if self._tb:
            self._tb.close()
