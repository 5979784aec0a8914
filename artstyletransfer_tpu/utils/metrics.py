"""Structured metrics and profiling.

The reference's observability is print() statements in the hot loop
(reference neural_style_transfer.py:159,189,196; task_executor.py:89-92).
TPU-native equivalents:

- MetricsLogger: JSON-lines event log (per-chunk loss/throughput/progress),
  cheap enough for production and machine-readable.
- profile_trace(): context manager around jax.profiler.trace — produces a
  TensorBoard-loadable XPlane trace of the jitted steps.
- Throughput: running steps/sec with warmup exclusion, used by bench.py and
  the executor's progress reports.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional


class MetricsLogger:
    """Append-only JSON-lines metrics sink."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)

    def log(self, event: str, **fields):
        record = {"t": time.time(), "event": event, **fields}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
        return record

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class Throughput:
    """Running steps/sec, excluding the first (compile-bearing) interval."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._last = None
        self._steps = 0
        self._elapsed = 0.0
        self._intervals = 0

    def tick(self, steps_done: int) -> Optional[float]:
        now = time.time()
        if self._last is not None:
            dt = now - self._last[0]
            dsteps = steps_done - self._last[1]
            # Synthetic/duplicate progress events must not enter the
            # running average: the convergence early-stop's completion
            # re-emit (the engine yields the final image again at
            # percent=100) arrives moments after the real final chunk and
            # can carry the entire un-run remainder of the budget as
            # phantom dsteps. Two filters: no real chunk completes in
            # under a millisecond, and no real chunk runs >50x faster
            # than the measured running rate (re-emits land 3-6 orders of
            # magnitude above it; real rate changes across chunks are
            # bounded by the fixed chunk cadence).
            synthetic = dt < 1e-3 or (
                dsteps > 0 and self._elapsed > 0 and self._steps > 0
                and dsteps / dt > 50.0 * self._steps / self._elapsed)
            if synthetic:
                self._last = (now, steps_done)
                return self.steps_per_sec
            if self._intervals > 0:  # skip the compile-bearing interval
                self._steps += dsteps
                self._elapsed += dt
            self._intervals += 1
        self._last = (now, steps_done)
        return self.steps_per_sec

    @property
    def steps_per_sec(self) -> Optional[float]:
        if self._elapsed <= 0:
            return None
        return self._steps / self._elapsed


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace of the enclosed block (no-op if log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
