"""Fused Pallas kernel for the PIPs-mixer temporal block.

Computes, in one pass over VMEM-resident tiles:

    h[t, 4c+m] = gelu( b_up[4c+m] + sum_k w_up[k, 4c+m] * x[t+k-off, c] )
    y[t, c]    = sum_m ( b_mix[4c+m]
                         + sum_k w_mix[k, 4c+m] * h[t+k-off, 4c+m] )

i.e. depthwise temporal conv (channel multiplier 4) -> GELU -> depthwise
conv -> fold the 4 lanes back. The XLA version materializes the 4x-expanded
hidden tensor in HBM twice; this kernel reads x once and writes y once, with
the hidden lanes living only in VMEM — the op is bandwidth-bound, so that is
a ~4-6x traffic cut.

Shapes: x [B, T, C]; weights in conv layout [k, 1, 4C] (checkpoint
compatible); grid tiles (B, C); T is kept whole per tile (falls back to the
XLA path for very long sequences).

The backward pass reuses jax.vjp of the pure-jnp formulation (the op is a
fixed small arithmetic graph; recomputation is cheaper than saving hidden
activations).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Test hook: run the kernel in interpreter mode on CPU.
FORCE_INTERPRET = False

# The Pallas kernel is numerically verified (see tests) but currently
# triggers pathological Mosaic compile times at production shapes, so the
# default dispatch uses the per-lane jnp formulation (which XLA fuses well);
# flip this to experiment with the fused kernel.
ENABLE_FUSED_KERNEL = False

_MAX_KERNEL_T = 512  # beyond this, hidden tiles would blow VMEM


def _math_reference(x, w_up, b_up, w_mix, b_mix, causal: bool):
  """Pure-jnp formulation (per-lane loops; no 4x repeat materialization)."""
  k = w_up.shape[0]
  b, t, c = x.shape
  mult = w_up.shape[-1] // c
  wu = w_up.reshape(k, c, mult)
  wm = w_mix.reshape(k, c, mult)
  bu = b_up.reshape(c, mult)
  bm = b_mix.reshape(c, mult)

  left = k - 1 if causal else (k - 1) // 2
  right = 0 if causal else k - 1 - left
  xp = jnp.pad(x, ((0, 0), (left, right), (0, 0)))

  y = jnp.zeros_like(x) + bm.sum(-1)
  for m in range(mult):
    h = jnp.zeros_like(x) + bu[:, m]
    for j in range(k):
      h = h + xp[:, j : j + t] * wu[j, :, m]
    h = jax.nn.gelu(h)
    hp = jnp.pad(h, ((0, 0), (left, right), (0, 0)))
    for j in range(k):
      y = y + hp[:, j : j + t] * wm[j, :, m]
  return y


def _kernel(xp_ref, wu_ref, bu_ref, wm_ref, bm_ref, y_ref, *, k, mult,
            t, causal):
  """Blocks are time-LEADING ([T', B, C]): slicing the leading (untiled)
  axis is free on TPU, whereas shifting along a sublane-tiled axis forces
  expensive relayouts. xp_ref holds x pre-padded by 2*(k-1) along time; the
  hidden sequence is computed on the extended domain [0, t + k - 1) and the
  output on [0, t)."""
  xp = xp_ref[:].astype(jnp.float32)
  _, tb, tc = xp.shape
  t_ext = t + k - 1
  left = k - 1 if causal else (k - 1) // 2

  # Real hidden values live at extended positions [left, left + t); the rest
  # correspond to the zero padding of h in the unfused formulation (NOT to
  # conv outputs over padded x -- gelu(bias) is nonzero there).
  t_idx = jax.lax.broadcasted_iota(jnp.int32, (t_ext, tb, tc), 0)
  valid = (t_idx >= left) & (t_idx < left + t)

  y = jnp.zeros((t, tb, tc), jnp.float32) + jnp.sum(
      bm_ref[:].astype(jnp.float32), axis=-1
  )
  for m in range(mult):
    h = jnp.zeros((t_ext, tb, tc), jnp.float32) + bu_ref[:, m].astype(
        jnp.float32
    )
    for j in range(k):
      h = h + xp[j : j + t_ext] * wu_ref[j, :, m].astype(jnp.float32)
    h = jnp.where(valid, jax.nn.gelu(h), 0.0)
    for j in range(k):
      y = y + h[j : j + t] * wm_ref[j, :, m].astype(jnp.float32)
  y_ref[:] = y.astype(y_ref.dtype)


def _pallas_forward(x, w_up, b_up, w_mix, b_mix, causal: bool):
  k = w_up.shape[0]
  b, t, c = x.shape
  mult = w_up.shape[-1] // c
  wu = w_up.reshape(k, c, mult)
  wm = w_mix.reshape(k, c, mult)
  bu = b_up.reshape(c, mult)
  bm = b_mix.reshape(c, mult)

  # Time-leading layout + pre-pad by 2*(k-1) so both convs are pure
  # leading-axis slices in-kernel.
  left = k - 1 if causal else (k - 1) // 2
  right = 0 if causal else k - 1 - left
  xt = jnp.swapaxes(x, 0, 1)  # [T, B, C]
  xt = jnp.pad(xt, ((2 * left, 2 * right), (0, 0), (0, 0)))

  tile_c = min(-(-c // 128) * 128, 128)
  tile_b = max(1, (512 * 1024) // (t * tile_c * 2 * (1 + mult)))
  tile_b = min(-(-b // 8) * 8, max(8, tile_b // 8 * 8))
  pad_b = -b % tile_b
  pad_c = -c % tile_c
  if pad_b or pad_c:
    xt = jnp.pad(xt, ((0, 0), (0, pad_b), (0, pad_c)))
    wu = jnp.pad(wu, ((0, 0), (0, pad_c), (0, 0)))
    wm = jnp.pad(wm, ((0, 0), (0, pad_c), (0, 0)))
    bu = jnp.pad(bu, ((0, pad_c), (0, 0)))
    bm = jnp.pad(bm, ((0, pad_c), (0, 0)))
  tp, bp, cp = xt.shape

  grid = (bp // tile_b, cp // tile_c)
  y = pl.pallas_call(
      functools.partial(_kernel, k=k, mult=mult, t=t, causal=causal),
      grid=grid,
      in_specs=[
          pl.BlockSpec(
              (tp, tile_b, tile_c),
              lambda i, j: (0, i, j),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (k, tile_c, mult),
              lambda i, j: (0, j, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (tile_c, mult), lambda i, j: (j, 0), memory_space=pltpu.VMEM
          ),
          pl.BlockSpec(
              (k, tile_c, mult),
              lambda i, j: (0, j, 0),
              memory_space=pltpu.VMEM,
          ),
          pl.BlockSpec(
              (tile_c, mult), lambda i, j: (j, 0), memory_space=pltpu.VMEM
          ),
      ],
      out_specs=pl.BlockSpec(
          (t, tile_b, tile_c),
          lambda i, j: (0, i, j),
          memory_space=pltpu.VMEM,
      ),
      out_shape=jax.ShapeDtypeStruct((t, bp, cp), x.dtype),
      interpret=FORCE_INTERPRET,
  )(xt, wu, bu, wm, bm)
  return jnp.swapaxes(y[:, :b, :c], 0, 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def temporal_depthwise(x, w_up, b_up, w_mix, b_mix, causal: bool = False):
  """Fused depthwise-conv -> GELU -> depthwise-conv -> lane fold.

  Args:
    x: [B, T, C].
    w_up / w_mix: [k, 1, mult*C] conv-layout kernels.
    b_up / b_mix: [mult*C] biases.
    causal: causal (left-only) vs SAME padding.

  Returns:
    [B, T, C].
  """
  if FORCE_INTERPRET:
    return _pallas_forward(x, w_up, b_up, w_mix, b_mix, causal)
  if (
      not ENABLE_FUSED_KERNEL
      or x.shape[1] <= 1
      or x.shape[1] > _MAX_KERNEL_T
  ):
    return _math_reference(x, w_up, b_up, w_mix, b_mix, causal)
  # Select the implementation by the platform this trace lowers to: the
  # Pallas kernel on TPU, plain jnp elsewhere (including CPU-device init
  # while a TPU backend is the process default).
  return jax.lax.platform_dependent(
      x,
      w_up,
      b_up,
      w_mix,
      b_mix,
      tpu=functools.partial(_pallas_forward, causal=causal),
      default=functools.partial(_math_reference, causal=causal),
  )


def _fwd(x, w_up, b_up, w_mix, b_mix, causal):
  return temporal_depthwise(x, w_up, b_up, w_mix, b_mix, causal), (
      x, w_up, b_up, w_mix, b_mix,
  )


def _bwd(causal, res, g):
  x, w_up, b_up, w_mix, b_mix = res
  _, vjp = jax.vjp(
      lambda *args: _math_reference(*args, causal), x, w_up, b_up, w_mix,
      b_mix,
  )
  return vjp(g)


temporal_depthwise.defvjp(_fwd, _bwd)
