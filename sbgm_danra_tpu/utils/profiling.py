"""Tracing and throughput instrumentation.

The reference's observability is a 100-batch loader probe and tqdm postfixes
(SURVEY.md §5.1). TPU-native replacements:

- ``trace``: context manager around ``jax.profiler`` producing TensorBoard-
  loadable traces of the compiled steps (XLA op breakdown, HBM usage);
- ``StepTimer``: rolling per-step wall time + items/sec, cheap enough to leave
  on in production loops;
- ``loader_probe``: the reference's fetch-time probe (training_main.py:58-63).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import deque
from typing import Iterator, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Rolling window of step durations -> steps/sec and items/sec."""

    def __init__(self, window: int = 50):
        self.durations: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step's duration (or None)."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.durations.append(dt)
        self._last = now
        return dt

    def reset(self) -> None:
        self._last = None

    @property
    def steps_per_sec(self) -> float:
        if not self.durations:
            return 0.0
        return len(self.durations) / sum(self.durations)

    def items_per_sec(self, items_per_step: int) -> float:
        return self.steps_per_sec * items_per_step


def loader_probe(loader, n_batches: int = 100) -> float:
    """Average seconds/batch over the first n batches (reference :58-63)."""
    t0 = time.perf_counter()
    n = 0
    for _, _batch in zip(range(n_batches), iter(loader)):
        n += 1
    if n == 0:
        return float("nan")
    dt = (time.perf_counter() - t0) / n
    logger.info("loader probe: %.4f s/batch over %d batches", dt, n)
    return dt
