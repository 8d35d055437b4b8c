"""Tracing / profiling utilities.

TPU-native replacement for the reference's manual wall-clock timers
(torchlight io.py:132-157, per-iter prints processor_v2.py:982-983):

- `trace(log_dir)`: context manager around `jax.profiler` producing a
  TensorBoard-compatible trace of the compiled steps (XLA ops, fusions,
  MXU utilization);
- `annotate(name)`: named trace span (shows up in the trace viewer);
- `StepTimer`: per-step wall timing synchronized by VALUE FETCH — on this
  platform `jax.block_until_ready` can return before execution finishes
  (see train/timing.py), so each measured step ends with a scalar
  device->host copy instead. That makes StepTimer an *upper bound*
  (dispatch + execute + fetch RTT); for throughput numbers use
  `timing.marginal_step_time`, which cancels the constant overhead.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

from .timing import fetch_scalar


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Collects per-step wall times (seconds), value-fetch synchronized.

    Pass the step's result (e.g. its metrics dict) to `stop`/`measure`; the
    timer fetches one scalar from it so the interval provably covers device
    execution. `sync=False` records raw dispatch times (useful only to
    quantify dispatch overhead itself).
    """

    def __init__(self, sync: bool = True):
        self.times: list[float] = []
        self.sync = sync
        self._t0: float | None = None

    @contextlib.contextmanager
    def measure(self, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            fetch_scalar(result)
        self.times.append(time.perf_counter() - t0)

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if self.sync and result is not None:
            fetch_scalar(result)
        assert self._t0 is not None
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> dict:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
        }
