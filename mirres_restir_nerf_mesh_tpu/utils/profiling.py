"""Tracing / profiling / structured metrics (first-class, unlike the
reference which only has wall-clock prints — SURVEY.md §5).

- `trace(dir)`: context manager around jax.profiler for TensorBoard-viewable
  device traces.
- `PhaseTimer`: named per-phase wall-clock accumulation with a summary line.
- `MetricsWriter`: append-only JSONL metrics (replacement for tensorboardX
  scalars, nerf/utils.py:1602-1607) — machine-readable, no TF dependency.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; blocks on device work so the
    numbers are true step costs, not dispatch time."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        parts = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            avg = self.totals[k] / max(self.counts[k], 1)
            parts.append(f"{k}: {self.totals[k]:.2f}s total, {avg*1000:.1f}ms avg x{self.counts[k]}")
        return " | ".join(parts)


class MetricsWriter:
    """Append-only JSONL scalar log: one line per record with step + wall time."""

    def __init__(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path
        self._t0 = time.time()

    def write(self, step: int, **scalars) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in scalars.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
