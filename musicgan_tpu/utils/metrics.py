"""Host-side metric sink: sliding-window console stats + CSV log.

Replaces the reference's MLflow + tqdm observability (reference
``train.py:118-127,224-244``) with a dependency-free writer.  Device
metrics arrive as (possibly still-inflight) JAX scalars; they are only
materialized on the logging cadence, so the train loop never blocks on a
device sync per step (the reference syncs ~6 scalars every iteration,
``train.py:180-186``).
"""

from __future__ import annotations

import collections
import csv
import os
import time
from typing import Mapping

__all__ = ["MetricLogger"]


_DEFAULT_FIELDS = (
    "disc_loss", "grad_pen", "e_tp", "e_tn", "gen_loss", "e_gen", "alpha",
)


class MetricLogger:
    def __init__(
        self, output_dir: str, window: int = 20,
        fields: tuple = _DEFAULT_FIELDS,
    ):
        self.fields = fields
        os.makedirs(output_dir, exist_ok=True)
        self.csv_path = os.path.join(output_dir, "metrics.csv")
        self.window = window
        self._windows: dict[str, collections.deque] = {}
        self._csv_file = None
        self._csv_writer = None
        self._t0 = time.perf_counter()

    def push(self, metrics: Mapping[str, float]) -> None:
        """Accumulate one step's (host) metric values into the windows."""
        for k, v in metrics.items():
            self._windows.setdefault(
                k, collections.deque(maxlen=self.window)
            ).append(float(v))

    def window_means(self) -> dict[str, float]:
        return {
            k: sum(w) / len(w) for k, w in self._windows.items() if w
        }

    def log_row(self, step: int, stage: int, extra: Mapping[str, float] | None = None):
        row = {
            "step": step,
            "stage": stage,
            "wall_s": round(time.perf_counter() - self._t0, 3),
            **{k: round(v, 6) for k, v in self.window_means().items()},
            **({k: round(float(v), 6) for k, v in (extra or {}).items()}),
        }
        if self._csv_writer is None:
            # Fixed column set: a critic-only first row must not freeze the
            # header without the generator columns.
            names = ["step", "stage", "wall_s"] + [
                k for k in self.fields if k not in ("step", "stage", "wall_s")
            ] + [k for k in row if k not in ("step", "stage", "wall_s")
                 and k not in self.fields]
            self._csv_file = open(self.csv_path, "a", newline="")
            self._csv_writer = csv.DictWriter(
                self._csv_file, fieldnames=names, extrasaction="ignore"
            )
            if self._csv_file.tell() == 0:
                self._csv_writer.writeheader()
        self._csv_writer.writerow(row)
        self._csv_file.flush()
        return row

    def close(self):
        if self._csv_file:
            self._csv_file.close()
