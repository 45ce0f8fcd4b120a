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


def sequence_parallel_causal_conv(
    x: Array,
    w: Array,
    b: Array,
    cache: Optional[Array],
    mesh: Mesh,
    time_axis: str = "data",
) -> Tuple[Array, Array]:
  """Depthwise causal temporal conv with the time axis sharded over `mesh`.

  Matches models/rglru.CausalConv1D numerics exactly: zero history for a
  fresh sequence (cache None), otherwise `cache` [B, k-1, C] carries the
  last k-1 frames of the previous chunk. Each shard all-gathers the
  min(k-1, T/P)-frame tails (O(P*B*k*C) total, independent of T), slices
  out its exact k-1 frames of history — correct even when a shard holds
  fewer than k-1 frames, where the history spans several shards — and runs
  the same k shifted-FMA formulation locally. The streaming cache comes
  from the same gathered buffer for free.

  Args:
    x: [B, T, C]; T divisible by the mesh axis size.
    w: [k, C] depthwise kernel; b: [C] bias.
    cache: optional [B, k-1, C] history (streaming).
    mesh / time_axis: device mesh and the axis T is sharded over.

  Returns:
    (y [B, T, C] sharded like x, new_cache [B, k-1, C] replicated).
  """
  k = w.shape[0]
  num_shards = mesh.shape[time_axis]
  if x.shape[1] % num_shards != 0:
    raise ValueError(
        f"time dim {x.shape[1]} not divisible by mesh axis"
        f" '{time_axis}' ({num_shards})"
    )
  if cache is None:
    cache = jnp.zeros((x.shape[0], k - 1, x.shape[-1]), x.dtype)

  def shard_fn(x_sh, w_r, b_r, cache_r):
    t_local = x_sh.shape[1]
    m = min(k - 1, t_local)
    # [P, B, m, C] -> [B, P*m, C]: every shard's tail, in time order. When
    # t_local < k-1 the tails ARE the full shards, so the concatenation
    # below holds the entire global prefix.
    tails = jax.lax.all_gather(x_sh[:, t_local - m:], time_axis)
    tails = jnp.moveaxis(tails, 0, 1).reshape(
        x_sh.shape[0], num_shards * m, x_sh.shape[-1]
    )
    hist = jnp.concatenate([cache_r.astype(x_sh.dtype), tails], axis=1)
    # Shard i's k-1 frames of history are rows [i*m, i*m + k-1) of
    # [cache ++ tails]: for i = 0 that is the cache itself; otherwise the
    # slice ends exactly at the last gathered frame before this shard.
    idx = jax.lax.axis_index(time_axis)
    prev = jax.lax.dynamic_slice_in_dim(hist, idx * m, k - 1, axis=1)
    full = jnp.concatenate([prev, x_sh], axis=1)
    y = jnp.zeros_like(x_sh) + b_r
    for j in range(k):
      y = y + full[:, j : j + t_local] * w_r[j]
    # Last k-1 global frames (falling back to cache rows if T < k-1).
    new_cache = hist[:, hist.shape[1] - (k - 1):]
    return y, new_cache

  return jax.shard_map(
      shard_fn,
      mesh=mesh,
      in_specs=(P(None, time_axis), P(), P(), P()),
      out_specs=(P(None, time_axis), P()),
      check_vma=False,
  )(x, w, b, cache)


def shard_time(x: Array, mesh: Mesh, time_axis: str = "data") -> Array:
  """Places [B, T, ...] with T sharded over the mesh axis."""
  return jax.device_put(x, NamedSharding(mesh, P(None, time_axis)))
