"""Metrics/observability: scalar logging and profiling as first-class.

The reference logs scalars to TensorBoard (reference: run/main_run.py:50-53,
213-241) and has no systematic profiling (SURVEY §5). Here:

- :class:`MetricsWriter` appends scalar events to a JSONL file (one
  ``{"step", "tag", "value", "ts"}`` object per line — trivially greppable /
  plottable) with the same scalar set the reference writes (per-iter and
  windowed train loss/acc, val loss/acc/best, per-episode running test acc),
  and optionally mirrors every scalar into standard TensorBoard event files
  (``tb_dir=...``) readable by ``tensorboard --logdir`` — observability
  parity with the reference's ``SummaryWriter``
  (reference: run/main_run.py:50-53,213-220).
- :func:`jsonl_to_tensorboard` converts an existing metrics.jsonl into an
  event file after the fact (also exposed as ``scripts/jsonl_to_tb.py``).
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


def host_rss_gb() -> float:
    """Resident-set size of this process in GB (0.0 if unreadable).

    Logged with every training print line: host-memory growth is the
    leading indicator of a buffer-lifetime bug on remote/tunneled
    backends (a donation-style leak of ~1.4 GB/step OOM'd a 125 GB host
    in testing — README "Train-throughput levers"), and a number in every
    log line is what makes that failure diagnosable after the fact."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) / 1e6
    except OSError:
        pass
    return 0.0


def _open_event_writer(tb_dir: str):
    """Standard TensorBoard event-file writer, or None if the (optional)
    tensorboard package is unavailable."""
    try:
        from tensorboard.summary.writer.event_file_writer import \
            EventFileWriter
    except ImportError:  # pragma: no cover - tb is in the base image
        return None
    return EventFileWriter(tb_dir)


def _scalar_event(tag: str, value: float, step: int, wall_time: float):
    from tensorboard.compat.proto.event_pb2 import Event
    from tensorboard.compat.proto.summary_pb2 import Summary

    summary = Summary(value=[Summary.Value(tag=tag,
                                           simple_value=float(value))])
    return Event(wall_time=wall_time, step=int(step), summary=summary)


class MetricsWriter:
    """Append-only JSONL scalar writer, optionally mirrored to TensorBoard
    event files (the reference's observability surface,
    reference: run/main_run.py:50-53)."""

    def __init__(self, path: str, flush_every: int = 20,
                 tb_dir: Optional[str] = None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._f = open(path, "a")
        self._n = 0
        self._flush_every = flush_every
        self._tb = _open_event_writer(tb_dir) if tb_dir else None

    def scalar(self, tag: str, value: float, step: int) -> None:
        now = time.time()
        self._f.write(json.dumps({
            "step": int(step), "tag": tag, "value": float(value),
            "ts": round(now, 3)}) + "\n")
        if self._tb is not None:
            self._tb.add_event(_scalar_event(tag, value, step, now))
        self._n += 1
        if self._n % self._flush_every == 0:
            self._f.flush()

    def scalars(self, values: Dict[str, float], step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def flush(self) -> None:
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self._f.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def jsonl_to_tensorboard(jsonl_path: str, tb_dir: str) -> int:
    """Convert a metrics.jsonl produced by :class:`MetricsWriter` into a
    TensorBoard event file. Returns the number of scalars written."""
    writer = _open_event_writer(tb_dir)
    if writer is None:
        raise RuntimeError("tensorboard package not available")
    n = 0
    with open(jsonl_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            writer.add_event(_scalar_event(
                rec["tag"], rec["value"], rec["step"],
                rec.get("ts", time.time())))
            n += 1
    writer.close()
    return n


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
