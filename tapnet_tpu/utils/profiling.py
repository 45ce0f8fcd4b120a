"""Profiling and tracing utilities.

The reference has no systematic profiling (SURVEY §5.1: wall-clock FPS
counters only). This module provides:
  * `trace(dir)` — context manager around `jax.profiler` capturing an xprof
    trace of everything inside (view with TensorBoard / xprof).
  * `StageTimer` — named per-stage wall timers with device sync, for
    ingest / features / cost-volume / refinement breakdowns.
  * `benchmark(fn, *args)` — robust op timing that amortizes dispatch and
    host-sync latency by iterating the jitted function inside one jit
    (essential on remote-dispatch backends, where a single op's wall time is
    dominated by the synchronization round trip).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
  """Capture a jax.profiler trace of the enclosed block."""
  jax.profiler.start_trace(
      log_dir, create_perfetto_link=create_perfetto_link
  )
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StageTimer:
  """Accumulates wall time per named stage (device-synced)."""

  def __init__(self):
    self.totals: Dict[str, float] = {}
    self.counts: Dict[str, int] = {}

  @contextlib.contextmanager
  def stage(self, name: str, sync_value=None):
    t0 = time.perf_counter()
    try:
      yield
    finally:
      if sync_value is not None:
        jax.block_until_ready(sync_value)
      dt = time.perf_counter() - t0
      self.totals[name] = self.totals.get(name, 0.0) + dt
      self.counts[name] = self.counts.get(name, 0) + 1

  def summary(self) -> Dict[str, float]:
    return {
        name: self.totals[name] / max(self.counts[name], 1)
        for name in self.totals
    }

  def report(self) -> str:
    lines = []
    for name, mean in sorted(self.summary().items()):
      lines.append(
          f"{name}: {mean * 1000:.2f} ms/call x{self.counts[name]}"
      )
    return "\n".join(lines)


def benchmark(
    fn: Callable,
    *args,
    iters_per_measure: int = 10,
    num_measures: int = 3,
    warmup: int = 1,
) -> float:
  """Returns seconds per call of `fn(*args)`, amortizing dispatch latency.

  `fn` must be jittable and return a pytree of arrays; it is wrapped in a
  fori_loop that feeds (a scalar function of) the output back into a dummy
  data dependence so XLA cannot elide iterations.
  """

  @jax.jit
  def run_n(*args):
    # args must be jit parameters, not closure constants: closed-over arrays
    # are inlined into the serialized program, which breaks remote compilers
    # on large inputs.
    def once(_, carry):
      out = fn(*args)
      leaf = jax.tree_util.tree_leaves(out)[0]
      return carry + jnp.sum(leaf).astype(jnp.float32) * 0.0

    return jax.lax.fori_loop(0, iters_per_measure, once, jnp.float32(0))

  for _ in range(warmup):
    float(run_n(*args))
  times = []
  for _ in range(num_measures):
    t0 = time.perf_counter()
    float(run_n(*args))
    times.append((time.perf_counter() - t0) / iters_per_measure)
  return min(times)
