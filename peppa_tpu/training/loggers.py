"""Metric logging: TensorBoard event files + metrics.csv in the version dir.

Capability parity: reference self.log(...) -> TensorBoard under
lightning_logs/version_N/ (pig/models.py:264,273,298-318; SURVEY.md §5.5).
tensorboardX is used when available; the CSV mirror is always written so the
analysis layer never needs TB to read training curves.
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, version_dir: str):
        self.version_dir = version_dir
        os.makedirs(version_dir, exist_ok=True)
        self._csv_path = os.path.join(version_dir, "metrics.csv")
        self._fields = ["step", "epoch", "time"]
        self._rows = []
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(logdir=version_dir)
        except Exception:
            self._tb = None

    def log(self, metrics: Dict[str, float], step: int,
            epoch: Optional[int] = None) -> None:
        row = {"step": step, "epoch": epoch, "time": time.time()}
        for k, v in metrics.items():
            row[k] = float(v)
            if k not in self._fields:
                self._fields.append(k)
            if self._tb is not None:
                self._tb.add_scalar(k, float(v), global_step=step)
        self._rows.append(row)
        self._flush()

    def _flush(self) -> None:
        with open(self._csv_path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fields)
            writer.writeheader()
            for row in self._rows:
                writer.writerow(row)

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
