"""Scalar metric logging: stdout + CSV (SURVEY.md §5.5).

The reference relied on the Keras progress bar/history; here every scalar
goes to a CSV next to the checkpoints so runs are inspectable offline, with
an optional trailing-window stdout summary.
"""

from __future__ import annotations

import csv
import os
import sys
import time
from typing import Dict, Optional


class MetricWriter:
    def __init__(self, directory: Optional[str] = None, name: str = "train"):
        self._file = None
        self._writer = None
        self._fields = None
        self._t0 = time.time()
        if directory:
            os.makedirs(directory, exist_ok=True)
            self._path = os.path.join(directory, f"{name}_metrics.csv")
        else:
            self._path = None

    def write(self, step: int, scalars: Dict[str, float], echo: bool = False):
        row = {"step": step, "wall_s": round(time.time() - self._t0, 3)}
        row.update({k: float(v) for k, v in scalars.items()})
        if self._path:
            if self._writer is None:
                self._fields = list(row.keys())
                self._file = open(self._path, "a", newline="")
                self._writer = csv.DictWriter(
                    self._file, fieldnames=self._fields, extrasaction="ignore"
                )
                if self._file.tell() == 0:
                    self._writer.writeheader()
            self._writer.writerow(row)
            self._file.flush()
        if echo:
            msg = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()
            )
            print(msg, file=sys.stderr, flush=True)

    def close(self):
        if self._file:
            self._file.close()
