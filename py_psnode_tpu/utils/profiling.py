"""Profiling & observability helpers.

The reference's instrumentation is all dormant (commented-out
torch.autograd.profiler block, unused solver timing counters — SURVEY.md §5).
Here it is first-class:

  * :func:`trace` — ``jax.profiler`` context writing a Perfetto/TensorBoard
    trace directory.
  * :class:`StepTimer` — wall-clock step timing that forces completion via a
    scalar fetch (on tunneled device backends ``block_until_ready`` alone can
    report early — measured on this machine's axon backend).
  * :class:`JsonlMetrics` — structured metrics log (one JSON object per
    line) alongside the human-readable Logger.
"""

from __future__ import annotations

import contextlib
import json
import pathlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir):
    """``with trace('/tmp/prof'): run_steps()`` → open in Perfetto/TB."""
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Times windows of N steps; call ``sync_value`` with a scalar jax array
    whose value depends on all timed work (e.g. the last loss)."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.history = []

    def start(self):
        self.t0 = time.time()

    def stop(self, sync_value, n_steps: int = 1) -> float:
        float(sync_value)  # force completion
        dt = (time.time() - self.t0) / n_steps
        self.history.append(dt)
        return dt

    @property
    def best(self):
        return min(self.history) if self.history else None


class JsonlMetrics:
    def __init__(self, path):
        self.path = pathlib.Path(path)
        self._f = open(self.path, "a")

    def log(self, **kv):
        kv.setdefault("ts", time.time())
        self._f.write(json.dumps(kv) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
