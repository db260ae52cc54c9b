"""Tracing / profiling utilities (SURVEY §5.1 — absent in the reference,
first-class here).

- ``trace(logdir)``: context manager around ``jax.profiler`` traces; view in
  TensorBoard or Perfetto (the trace captures XLA ops, fusion boundaries and
  HBM transfers on TPU).
- ``start_server(port)``: on-demand profiling server for live capture from a
  running training job (``jax.profiler.start_server``).
- ``StepTimer``: wall-clock per-step timing with ``block_until_ready``
  barriers around the measured section plus an EMA, for the trainers' CSV
  logs; cheap enough to leave on.
- ``annotate(name)``: TraceAnnotation wrapper so host-side phases (data wait,
  augment dispatch, checkpoint write) show up on the trace timeline.
"""

from __future__ import annotations

import contextlib
import time

import jax


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self._ema_coef = ema
        self.ema_ms: float | None = None
        self.last_ms: float = 0.0
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = (time.perf_counter() - self._t0) * 1000.0
        self.last_ms = dt
        self.ema_ms = dt if self.ema_ms is None else (
            self._ema_coef * self.ema_ms + (1 - self._ema_coef) * dt
        )
        return dt

    @contextlib.contextmanager
    def measure(self):
        self.start()
        try:
            yield self
        finally:
            self.stop()
