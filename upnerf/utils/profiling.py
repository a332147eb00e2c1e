"""Profiling / tracing utilities.

The reference relies on Lightning's `profiler="simple"` wall-time table
(train.py:75). TPU-native equivalents:

- `trace(logdir)`: jax.profiler trace context (view with TensorBoard /
  Perfetto; works on real TPU).
- `StepTimer`: wall-clock step timing with a *forced scalar readout* —
  essential on remote-tunnel backends where `block_until_ready` returns
  before execution finishes (see bench.py).
- `summarize(metrics_jsonl)`: per-key mean/percentile table from the
  training metrics stream, the moral equivalent of Lightning's exit table.
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Callable, Dict, List

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times blocks of steps; `readout` must fetch a value data-dependent
    on the timed computation (e.g. a parameter sum)."""

    def __init__(self, readout: Callable[[], float]):
        self.readout = readout
        self.records: List[float] = []

    @contextlib.contextmanager
    def measure(self, n_steps: int = 1):
        t0 = time.perf_counter()
        yield
        self.readout()
        dt = (time.perf_counter() - t0) / n_steps
        self.records.append(dt)

    @property
    def mean(self) -> float:
        return float(np.mean(self.records)) if self.records else float("nan")

    @property
    def p50(self) -> float:
        return float(np.percentile(self.records, 50)) if self.records else float("nan")


def summarize(metrics_jsonl: str) -> Dict[str, Dict[str, float]]:
    rows: Dict[str, List[float]] = {}
    with open(metrics_jsonl) as f:
        for line in f:
            rec = json.loads(line)
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k not in ("step", "time"):
                    rows.setdefault(k, []).append(float(v))
    return {
        k: {
            "mean": float(np.mean(v)),
            "p50": float(np.percentile(v, 50)),
            "last": v[-1],
            "n": len(v),
        }
        for k, v in rows.items()
    }
