"""Sequence-parallel linear recurrence over a device mesh.

The reference scales sequence length by single-device recurrence + chunking
only (SURVEY §5.7; its recurrentgemma scan exposes a sharding-spec hook but
no cross-device algorithm). This module implements the real thing for the
RG-LRU recurrence y[t] = a[t]*y[t-1] + x[t]:

  1. every device runs the fused local scan (ops/scan.py Pallas kernel) on
     its time shard, from a zero carry, and the in-chunk cumulative decay
     prod(a[0..t]);
  2. per-device (total_decay, last_state) pairs — two [B, C] tensors — are
     all-gathered over ICI;
  3. each device computes its incoming carry with a tiny P-step scan over
     the gathered pairs and corrects its local outputs in one fused
     multiply-add: y += cumdecay * carry_in.

Communication is O(P * B * C) (independent of T), so arbitrarily long
sequences parallelize over the mesh at the cost of one small all-gather.
Differentiable end-to-end (the local scans carry their custom VJPs; the
correction is plain arithmetic).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tapnet_tpu.ops import scan as scan_lib

Array = jnp.ndarray


def _local_pass(x: Array, a: Array) -> Tuple[Array, Array, Array, Array]:
  """Local scan from zero carry + in-chunk cumulative decay.

  Returns (y_local [B,T,C], last_local [B,C] fp32,
           cumdecay [B,T,C], total_decay [B,C] fp32), where
  cumdecay[t] = prod(a[0..t]).
  """
  zeros = jnp.zeros(
      (x.shape[0], x.shape[2]), jnp.float32
  )
  y_local, last_local = scan_lib.linear_scan(x, a, zeros)
  # cumprod via the same recurrence: h[t] = a[t]*h[t-1] with h[-1] = 1 is
  # a linear scan whose only input is a[0] at t=0.
  seed = jnp.concatenate([a[:, :1], jnp.zeros_like(a[:, 1:])], axis=1)
  cumdecay, total_decay = scan_lib.linear_scan(seed, a, zeros)
  return y_local, last_local, cumdecay, total_decay


def sequence_parallel_linear_scan(
    x: Array,
    a: Array,
    h0: Optional[Array],
    mesh: Mesh,
    time_axis: str = "data",
) -> Tuple[Array, Array]:
  """h[t] = a[t] * h[t-1] + x[t] with the time axis sharded over `mesh`.

  Args:
    x: [B, T, C] inputs; T must be divisible by the mesh axis size.
    a: [B, T, C] decays.
    h0: [B, C] float32 initial state (None = zeros), replicated.
    mesh: device mesh.
    time_axis: mesh axis name the time dimension is sharded over.

  Returns:
    (y [B, T, C] sharded over time like x, h_last [B, C] fp32 replicated).
  """
  if h0 is None:
    h0 = jnp.zeros((x.shape[0], x.shape[2]), jnp.float32)

  num_shards = mesh.shape[time_axis]
  if x.shape[1] % num_shards != 0:
    raise ValueError(
        f"time dim {x.shape[1]} not divisible by mesh axis"
        f" '{time_axis}' ({num_shards})"
    )

  def shard_fn(x_sh, a_sh, h0_rep):
    y_local, last_local, cumdecay, total_decay = _local_pass(x_sh, a_sh)

    gathered_decay = jax.lax.all_gather(
        total_decay, time_axis
    )  # [P, B, C]
    gathered_last = jax.lax.all_gather(last_local, time_axis)

    def step(carry, pair):
      decay_p, last_p = pair
      return decay_p * carry + last_p, carry

    h_last, carries_in = jax.lax.scan(
        step, h0_rep, (gathered_decay, gathered_last)
    )
    carry_in = carries_in[jax.lax.axis_index(time_axis)]  # [B, C]
    y = (
        y_local.astype(jnp.float32)
        + cumdecay.astype(jnp.float32) * carry_in[:, None, :]
    )
    return y.astype(x_sh.dtype), h_last

  sharded = jax.shard_map(
      shard_fn,
      mesh=mesh,
      in_specs=(P(None, time_axis), P(None, time_axis), P()),
      out_specs=(P(None, time_axis), P()),
      check_vma=False,
  )
  return sharded(x, a, h0)


def shard_time(x: Array, mesh: Mesh, time_axis: str = "data") -> Array:
  """Places [B, T, ...] with T sharded over the mesh axis."""
  return jax.device_put(x, NamedSharding(mesh, P(None, time_axis)))
