"""Tracing / profiling hooks (SURVEY.md §5.1 TPU equivalent).

The reference has no profiling beyond unused wall-clock decorators and
tqdm bars.  Here: a step timer that aggregates per-stage throughput
statistics, and a context manager around ``jax.profiler`` device traces
for offline inspection with TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax


@dataclass
class StepTimer:
    """Aggregates step wall-times and items/sec; cheap enough to keep on."""

    name: str = "train"
    warmup: int = 2          # first steps include compile — excluded from stats
    _times: List[float] = field(default_factory=list)
    _items: List[int] = field(default_factory=list)
    _t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        self._items.append(items)
        return dt

    @contextlib.contextmanager
    def step(self, items: int = 1):
        self.start()
        yield
        self.stop(items)

    def summary(self) -> Dict[str, float]:
        times = self._times[self.warmup:] or self._times
        items = self._items[self.warmup:] or self._items
        if not times:
            return {}
        total = sum(times)
        return {
            "steps": len(times),
            "mean_ms": 1000.0 * total / len(times),
            "p50_ms": 1000.0 * sorted(times)[len(times) // 2],
            "items_per_sec": sum(items) / total if total > 0 else 0.0,
            "compile_ms": 1000.0 * (self._times[0] if self._times else 0.0),
        }

    def dump(self, path: str | Path) -> None:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        Path(path).write_text(json.dumps({self.name: self.summary()}, indent=2))


@contextlib.contextmanager
def device_trace(log_dir: str | Path, enabled: bool = True):
    """``jax.profiler`` trace scope; view with TensorBoard/XProf offline."""
    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
