"""Metrics/observability: scalar logging and profiling as first-class.

The reference logs scalars to TensorBoard (reference: run/main_run.py:50-53,
213-241) and has no systematic profiling (SURVEY §5). Here:

- :class:`MetricsWriter` appends scalar events to a JSONL file (one
  ``{"step", "tag", "value", "ts"}`` object per line — trivially greppable /
  plottable, and convertible to TensorBoard if wanted) with the same scalar
  set the reference writes (per-iter and windowed train loss/acc, val
  loss/acc/best, per-episode running test acc).
- :class:`TestAccuracies` mirrors the reference's results formatter
  (reference: utils/utils.py:19-55).
- :func:`profile_trace` wraps a block in a ``jax.profiler`` trace.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterable, Optional


class MetricsWriter:
    """Append-only JSONL scalar writer (TensorBoard-equivalent surface)."""

    def __init__(self, path: str, flush_every: int = 20):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._n = 0
        self._flush_every = flush_every

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({
            "step": int(step), "tag": tag, "value": float(value),
            "ts": round(time.time(), 3)}) + "\n")
        self._n += 1
        if self._n % self._flush_every == 0:
            self._f.flush()

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def flush(self) -> None:
        self._f.flush()

    def close(self) -> None:
        self._f.flush()
        self._f.close()


class TestAccuracies:
    """Results formatter (reference: utils/utils.py:19-55)."""

    def __init__(self, datasets: Iterable[str]):
        self.datasets = list(datasets)

    def format(self, accuracy_dict: Dict[str, Dict[str, float]]) -> str:
        lines = [""]
        for ds in self.datasets:
            if ds in accuracy_dict:
                d = accuracy_dict[ds]
                lines.append(f"{ds}: {d['accuracy']:.1f}+/-{d['confidence']:.1f}")
        lines.append("")
        return "\n".join(lines)


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
