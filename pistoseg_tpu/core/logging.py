"""Experiment logging: CSV metrics, JSONL events, TensorBoard events,
console blocks.

The reference logs via TensorBoard+CSV Lightning loggers, CRITICAL-level
file logging, and ANSI console blocks (``mosaic_train.py:94-117``,
``mosaic_module.py:203-215``).  Here: a CSV writer per stage, a JSONL
event stream (machine-readable), TensorBoard event files under
``{log_dir}/tb`` (scalars per log row, image panels via
:meth:`MetricsLogger.log_image` — written by the dependency-free encoder
in :mod:`pistoseg_tpu.core.tboard`), and the same colored console metric
block.  The CSV is Lightning-CSV-compatible (one row per epoch, columns
sorted).
"""

from __future__ import annotations

import csv
import json
import sys
import time
from pathlib import Path
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str | Path, stage: str, tensorboard: bool = True):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.stage = stage
        self.csv_path = self.dir / f"{stage}_metrics.csv"
        self.jsonl_path = self.dir / f"{stage}_events.jsonl"
        self._fieldnames: Optional[list] = None
        self._tb = None
        if tensorboard:
            from pistoseg_tpu.core.tboard import SummaryWriter

            self._tb = SummaryWriter(self.dir / "tb")

    def _tb_step(self, row: Dict) -> int:
        for key in ("step", "epoch"):
            if key in row:
                try:
                    return int(row[key])
                except (TypeError, ValueError):
                    pass
        return 0

    def log(self, metrics: Dict) -> None:
        row = {k: (float(v) if hasattr(v, "__float__") else v) for k, v in metrics.items()}
        row["wall_time"] = time.time()
        if self._tb is not None:
            self._tb.add_scalars(
                {k: v for k, v in row.items() if k != "wall_time"},
                self._tb_step(row), prefix=f"{self.stage}/",
            )
        with self.jsonl_path.open("a") as f:
            f.write(json.dumps(row) + "\n")
        if self._fieldnames is None:
            self._fieldnames = sorted(row.keys())
            write_header = not self.csv_path.exists()
            with self.csv_path.open("a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
                if write_header:
                    w.writeheader()
                w.writerow(row)
        else:
            with self.csv_path.open("a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
                w.writerow(row)


    def log_image(self, tag: str, image_hwc, step: int = 0) -> None:
        """Image panel to TensorBoard (reference ``mosaic_module.py:271-277``)."""
        if self._tb is not None:
            self._tb.add_image(f"{self.stage}/{tag}", image_hwc, step)


def snapshot_code(log_dir: str | Path) -> Path:
    """Copy the framework sources into ``{log_dir}/code`` for experiment
    provenance (reference behavior: ``mosaic_train.py:89-92``)."""
    import shutil

    src = Path(__file__).resolve().parents[1]
    dst = Path(log_dir) / "code" / src.name
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst, ignore=shutil.ignore_patterns("__pycache__", "*.so"))
    return dst


def console_metric_block(title: str, metrics: Dict[str, float], color: str = "35") -> None:
    """Reference-style ANSI metric block (``mosaic_module.py:203-215``)."""
    print("\n" + "-" * 50)
    print(f"\n{title}")
    for name, value in metrics.items():
        if isinstance(value, float):
            print(f"{name}: \033[1;{color}m{value:.4f}\033[0m")
        else:
            print(f"{name}: \033[1;{color}m{value}\033[0m")
    print("\n" + "-" * 50)
    sys.stdout.flush()
