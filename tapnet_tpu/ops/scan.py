"""Pallas TPU kernel for the diagonal linear recurrence (RG-LRU scan).

Computes h[t] = a[t] * h[t-1] + x[t] over time with fp32 carries.

Why a kernel: `jax.lax.associative_scan` materializes O(log T) full passes
over the [B, T, C] tensors in HBM; this kernel streams each element exactly
once (read x, a; write y), making the op purely bandwidth-bound at its
theoretical minimum. The sequential dependence rides in a VMEM scratch
register across a (batch, channel, time-chunk) grid.

The backward pass is the same recurrence run in reverse on the output
cotangent (g[t] = dy[t] + a[t+1] * g[t+1]), implemented with the same kernel
via time reversal; da/dx/dh0 are cheap elementwise products XLA fuses.

`linear_scan` is a drop-in replacement for
tapnet_tpu.models.rglru.linear_recurrence and is used automatically on TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _scan_kernel(x_ref, a_ref, h0_ref, y_ref, hlast_ref, h_scratch):
  """One (batch, channel, time-chunk) grid step of the forward scan."""
  t_chunk = pl.program_id(2)

  @pl.when(t_chunk == 0)
  def _():
    h_scratch[:] = h0_ref[:].astype(jnp.float32)

  tt = x_ref.shape[1]

  def body(t, h):
    h = (
        a_ref[:, t, :].astype(jnp.float32) * h
        + x_ref[:, t, :].astype(jnp.float32)
    )
    y_ref[:, t, :] = h.astype(y_ref.dtype)
    return h

  h = jax.lax.fori_loop(0, tt, body, h_scratch[:])
  h_scratch[:] = h

  @pl.when(t_chunk == pl.num_programs(2) - 1)
  def _():
    hlast_ref[:] = h


def _pick_tiles(b: int, t: int, c: int) -> Tuple[int, int, int]:
  """Choose (batch, time, channel) tile sizes.

  The kernel's cost is dominated by the sequential time loop: every
  (b-tile, c-tile) pair walks all T steps, so total loop iterations are
  (B/tile_b) * (C/tile_c) * T. Maximize the tile_b*tile_c area (bounded by
  VMEM) to minimize iterations; tile_t then just sets DMA granularity.
  """
  # TPU blocking requires the middle (time) tile to be a multiple of 8 (or
  # the full T); keep it at 8 and spend the VMEM budget on tile area.
  tile_t = t if t <= 8 else 8
  while t % tile_t:
    tile_t -= 1
  tile_c = min(-(-c // 128) * 128, 512)
  # 3 buffers (x, a, y) * tile_b * tile_t * tile_c * 4B, double-buffered by
  # the pipeline: budget ~4 MB per set to stay under the 16 MB VMEM limit.
  tile_b = 4 * 1024 * 1024 // (3 * 4 * tile_t * tile_c)
  tile_b = min(-(-b // 8) * 8, max(8, tile_b // 8 * 8))
  return tile_b, tile_t, tile_c


# Test hook: force the Pallas kernel in interpreter mode on CPU.
FORCE_INTERPRET = False


def _scan_pallas(x: Array, a: Array, h0: Array) -> Tuple[Array, Array]:
  """Forward scan via pallas_call. x, a: [B, T, C]; h0: [B, C] fp32."""
  b, t, c = x.shape
  tile_b, tile_t, tile_c = _pick_tiles(b, t, c)
  pad_b = -b % tile_b
  pad_c = -c % tile_c
  if pad_b or pad_c:
    x = jnp.pad(x, ((0, pad_b), (0, 0), (0, pad_c)))
    a = jnp.pad(a, ((0, pad_b), (0, 0), (0, pad_c)))
    h0 = jnp.pad(h0, ((0, pad_b), (0, pad_c)))
  bp, _, cp = x.shape

  grid = (bp // tile_b, cp // tile_c, t // tile_t)
  y, h_last = pl.pallas_call(
      _scan_kernel,
      grid=grid,
      in_specs=[
          pl.BlockSpec(
              (tile_b, tile_t, tile_c),
              lambda i, j, k: (i, k, j),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (tile_b, tile_t, tile_c),
              lambda i, j, k: (i, k, j),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (tile_b, tile_c),
              lambda i, j, k: (i, j),
              memory_space=pltpu.VMEM,
          ),
      ],
      out_specs=[
          pl.BlockSpec(
              (tile_b, tile_t, tile_c),
              lambda i, j, k: (i, k, j),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (tile_b, tile_c),
              lambda i, j, k: (i, j),
              memory_space=pltpu.VMEM,
          ),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((bp, t, cp), x.dtype),
          jax.ShapeDtypeStruct((bp, cp), jnp.float32),
      ],
      scratch_shapes=[pltpu.VMEM((tile_b, tile_c), jnp.float32)],
      interpret=FORCE_INTERPRET,
  )(x, a, h0)
  return y[:b, :, :c], h_last[:b, :c]


def _scan_xla(x: Array, a: Array, h0: Array) -> Tuple[Array, Array]:
  """Associative-scan fallback (CPU/GPU and tiny shapes)."""
  xf = x.astype(jnp.float32)
  af = a.astype(jnp.float32)
  first = af[:, 0] * h0 + xf[:, 0]
  xf = jax.lax.dynamic_update_index_in_dim(xf, first, 0, axis=1)

  def combine(left, right):
    a_l, x_l = left
    a_r, x_r = right
    return a_l * a_r, a_r * x_l + x_r

  _, y = jax.lax.associative_scan(combine, (af, xf), axis=1)
  return y.astype(x.dtype), y[:, -1]


def _use_pallas() -> bool:
  return FORCE_INTERPRET or jax.default_backend() == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def linear_scan(x: Array, a: Array, h0: Array) -> Tuple[Array, Array]:
  """h[t] = a[t] * h[t-1] + x[t]; returns (y [B,T,C], h_last [B,C] fp32).

  h0 must be [B, C] float32 (pass zeros for a fresh sequence).
  """
  y, h_last = _scan_fwd_impl(x, a, h0)
  return y, h_last


def _scan_fwd_impl(x, a, h0):
  if x.shape[1] == 1:
    h = (
        a[:, 0].astype(jnp.float32) * h0
        + x[:, 0].astype(jnp.float32)
    )
    return h[:, None].astype(x.dtype), h
  if FORCE_INTERPRET:
    return _scan_pallas(x, a, h0)
  if _use_pallas():
    # Select by the platform this trace actually lowers to, not the process
    # default backend: params are often initialized on the host CPU device
    # while the default backend is TPU, and the Pallas kernel cannot lower
    # for CPU.
    return jax.lax.platform_dependent(
        x, a, h0, tpu=_scan_pallas, default=_scan_xla
    )
  return _scan_xla(x, a, h0)


def _scan_fwd(x, a, h0):
  y, h_last = _scan_fwd_impl(x, a, h0)
  return (y, h_last), (x, a, h0, y)


def _scan_bwd(residuals, cotangents):
  x, a, h0, y = residuals
  dy, dh_last = cotangents
  # Fold the h_last cotangent into the last step of dy.
  dyf = dy.astype(jnp.float32)
  if dh_last is not None:
    last = dyf[:, -1] + dh_last.astype(jnp.float32)
    dyf = jax.lax.dynamic_update_index_in_dim(dyf, last, dy.shape[1] - 1, 1)

  # g[t] = dy[t] + a[t+1] * g[t+1]  ==  forward scan on reversed time with
  # decay a'[t] = a_rev shifted by one (a'[0] = 1).
  a_rev = jnp.flip(a.astype(jnp.float32), axis=1)
  a_shift = jnp.concatenate(
      [jnp.ones_like(a_rev[:, :1]), a_rev[:, :-1]], axis=1
  )
  dy_rev = jnp.flip(dyf, axis=1)
  zeros = jnp.zeros_like(h0, jnp.float32)
  if _use_pallas() and dy.shape[1] > 1:
    g_rev, _ = _scan_pallas(dy_rev, a_shift, zeros)
  else:
    g_rev, _ = _scan_xla(dy_rev, a_shift, zeros)
  g = jnp.flip(g_rev, axis=1)

  # h[t-1]: previous outputs, with h0 at the front.
  h_prev = jnp.concatenate(
      [h0[:, None].astype(y.dtype), y[:, :-1]], axis=1
  )
  dx = g.astype(x.dtype)
  da = (g * h_prev.astype(jnp.float32)).astype(a.dtype)
  dh0 = a[:, 0].astype(jnp.float32) * g[:, 0]
  return dx, da, dh0


linear_scan.defvjp(_scan_fwd, _scan_bwd)
