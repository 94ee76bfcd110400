"""Per-phase wall-clock timers + optional device tracing.

Aux-subsystem parity with the reference's hand-rolled phase timers
(reference: GetDuration utilities.h:373; per-planner timers in
sampling/planner.h:153-156, ilqg/planner.cc:609-614) surfaced to plots.
Here: a Timers registry usable from the host loop, plus a context manager
around jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class Timers:
  """Accumulating named phase timers (milliseconds)."""

  def __init__(self):
    self.total_ms: Dict[str, float] = defaultdict(float)
    self.count: Dict[str, int] = defaultdict(int)
    self.last_ms: Dict[str, float] = defaultdict(float)

  @contextlib.contextmanager
  def phase(self, name: str):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      ms = (time.perf_counter() - t0) * 1e3
      self.total_ms[name] += ms
      self.count[name] += 1
      self.last_ms[name] = ms

  def mean_ms(self, name: str) -> float:
    c = self.count[name]
    return self.total_ms[name] / c if c else 0.0

  def summary(self) -> Dict[str, float]:
    return {k: self.mean_ms(k) for k in sorted(self.total_ms)}

  def reset(self):
    self.total_ms.clear()
    self.count.clear()
    self.last_ms.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
  """jax.profiler trace around a block (TPU equivalent of the reference's
  CPU timers; view with tensorboard or xprof)."""
  import jax
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()
