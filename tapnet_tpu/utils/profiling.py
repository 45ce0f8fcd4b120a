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


def _benchmark_times(
    fn: Callable,
    *args,
    iters_per_measure: int = 10,
    num_measures: int = 3,
    warmup: int = 1,
) -> list:
  """Returns a list of seconds-per-call measurements of `fn(*args)`.

  All measurements share ONE jitted loop (compiled during warmup) — building
  a fresh jit per measurement would recompile every rep, which on
  remote-dispatch backends costs tens of seconds per rep.

  `fn` must be jittable and return a pytree of arrays. Two defenses make
  the loop-in-jit timing honest:
    * EVERY floating-point input is perturbed by a carry-dependent value
      that underflows to zero, so each iteration's inputs are
      runtime-distinct and XLA cannot hoist the computation out of the
      loop as loop-invariant.
    * EVERY floating-point output is consumed by a full reduction
      (jnp.sum), so XLA cannot dead-code-eliminate the bulk of the work.
      Consuming only one element lets the compiler slice the computation
      down to what that element needs — elementwise ops then "run" at
      thousands of GB/s. The reduction costs one extra read of each
      output per iteration.
  Both passes are extra memory traffic (~one read of inputs + one of
  outputs); for compute-dominated ops this is noise, for pure-bandwidth
  ops measured time is up to ~2x the true cost (a safe overestimate).
  """

  @jax.jit
  def run_n(*args):
    # args must be jit parameters, not closure constants: closed-over arrays
    # are inlined into the serialized program, which breaks remote compilers
    # on large inputs.
    def once(_, carry):
      eps = carry * jnp.float32(1e-30)  # runtime value, rounds to +0.0

      def bump(x):
        if not hasattr(x, "dtype"):
          return x
        if jnp.issubdtype(x.dtype, jnp.floating):
          return x + eps.astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer):
          # eps rounds to integer zero, but remains a runtime value, so
          # integer inputs (int8 quantized paths) are also loop-carried.
          return x + eps.astype(x.dtype)
        return x

      args_i = jax.tree_util.tree_map(bump, args)
      out = fn(*args_i)
      picks = [
          jnp.sum(leaf, dtype=jnp.float32)
          for leaf in jax.tree_util.tree_leaves(out)
          if hasattr(leaf, "dtype")
          and (
              jnp.issubdtype(leaf.dtype, jnp.floating)
              or jnp.issubdtype(leaf.dtype, jnp.integer)
          )
      ]
      total = picks[0] if picks else jnp.float32(0)
      for p in picks[1:]:
        total = total + p
      return jnp.tanh(total)  # bounded, so eps stays denormal-tiny

    return jax.lax.fori_loop(0, iters_per_measure, once, jnp.float32(0))

  for _ in range(warmup):
    float(run_n(*args))
  times = []
  for _ in range(num_measures):
    t0 = time.perf_counter()
    float(run_n(*args))
    times.append((time.perf_counter() - t0) / iters_per_measure)
  return times


def benchmark(
    fn: Callable,
    *args,
    iters_per_measure: int = 10,
    num_measures: int = 3,
    warmup: int = 1,
) -> float:
  """Returns min seconds per call of `fn(*args)`. See `_benchmark_times`."""
  return min(
      _benchmark_times(
          fn,
          *args,
          iters_per_measure=iters_per_measure,
          num_measures=num_measures,
          warmup=warmup,
      )
  )


def benchmark_stats(
    fn: Callable,
    *args,
    iters_per_measure: int = 10,
    num_measures: int = 3,
    warmup: int = 1,
) -> Dict[str, float]:
  """Like `benchmark` but returns {"min", "median", "reps": [...]} seconds
  per call, so round-over-round drift is attributable to noise vs real
  change. All reps reuse one compiled loop; compile time is excluded."""
  times = _benchmark_times(
      fn,
      *args,
      iters_per_measure=iters_per_measure,
      num_measures=num_measures,
      warmup=warmup,
  )
  ordered = sorted(times)
  return {
      "min": ordered[0],
      "median": ordered[len(ordered) // 2],
      "reps": [round(t, 6) for t in times],
  }
