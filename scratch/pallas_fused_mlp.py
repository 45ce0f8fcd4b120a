"""Fused LayerNorm -> Dense -> GELU -> Dense -> residual Pallas kernel.

The PIPs-mixer channel MLP (reference tapir_model.py:92-124) is the FLOP
giant of TAPIR refinement (~80% of mixer time; the mixer is ~half the whole
480p pipeline). XLA executes the two matmuls well but spills the 4x-wide
hidden activation to HBM between them; this kernel keeps the hidden tile in
VMEM, so HBM traffic per block drops from ~5 passes over the (4x) hidden to
one read of x and one write of y.

Semantics (bit-matching the unfused Flax path):
    y = x + gelu_tanh(LN_{scale-only, eps=1e-5}(x) @ w1 + b1) @ w2 + b2
with LayerNorm statistics and GELU computed in fp32, matmuls accumulating
in fp32 on the MXU, IO in the input dtype (bf16 in production).

Backward recomputes through jax.vjp of the jnp reference (cheaper than
saving the hidden activation, same rationale as ops/depthwise_mixer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

# Test hook: run the kernel in interpreter mode on CPU.
FORCE_INTERPRET = False

# Measured on v5e at the production mixer shape ([128*250 tokens, 512->2048]):
# the Pallas kernel runs the mixer call in 22.5 ms vs 18.3 ms for XLA's own
# fusion of the unfused graph — the per-tile weight DMA (4.2 MB x 63 tiles
# per layer) costs more than the hidden-activation round-trip it saves. XLA
# keeps ~45% MXU utilization here and is the better scheduler; the kernel
# stays available for experimentation but is off by default.
ENABLE_FUSED_KERNEL = False

_LN_EPS = 1e-5


def _math_reference(x, ln_scale, w1, b1, w2, b2):
  """Pure-jnp formulation, identical to the unfused Flax modules."""
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
  xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
  xn = (xn * ln_scale.astype(jnp.float32)).astype(x.dtype)
  h = jnp.dot(xn, w1, preferred_element_type=jnp.float32)
  h = h + b1.astype(jnp.float32)
  h = jax.nn.gelu(h).astype(x.dtype)
  y = jnp.dot(h, w2, preferred_element_type=jnp.float32)
  y = y + b2.astype(jnp.float32)
  return x + y.astype(x.dtype)


def _kernel(x_ref, s_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref):
  x = x_ref[:]
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
  xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
  xn = (xn * s_ref[:].astype(jnp.float32)).astype(x.dtype)
  h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32)
  h = h + b1_ref[:].astype(jnp.float32)
  h = jax.nn.gelu(h).astype(x.dtype)
  y = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32)
  y = y + b2_ref[:].astype(jnp.float32)
  y_ref[:] = x + y.astype(x.dtype)


def _pallas_forward(x, ln_scale, w1, b1, w2, b2):
  m, c = x.shape
  hidden = w1.shape[1]
  # Token tile: big enough to amortize the (VMEM-resident) weights, small
  # enough that x/h tiles fit comfortably alongside them.
  tile_m = 512 if m >= 512 else max(8, -(-m // 8) * 8)
  pad_m = -m % tile_m
  if pad_m:
    x = jnp.pad(x, ((0, pad_m), (0, 0)))
  mp = x.shape[0]

  y = pl.pallas_call(
      _kernel,
      grid=(mp // tile_m,),
      in_specs=[
          pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
          pl.BlockSpec((c, hidden), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((hidden,), lambda i: (0,),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((hidden, c), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((tile_m, c), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
      interpret=FORCE_INTERPRET,
  )(x, ln_scale, w1, b1, w2, b2)
  return y[:m] if pad_m else y


@jax.custom_vjp
def mlp_block(x, ln_scale, w1, b1, w2, b2):
  """Fused residual channel-MLP: x + Dense(gelu(Dense(LN(x)))).

  Args:
    x: [..., C] tokens (any leading shape).
    ln_scale: [C] LayerNorm scale (scale-only LN, eps 1e-5).
    w1: [C, H]; b1: [H]; w2: [H, C]; b2: [C].

  Returns:
    [..., C], same dtype as x.
  """
  lead = x.shape[:-1]
  c = x.shape[-1]
  x2 = x.reshape(-1, c)
  if FORCE_INTERPRET:
    out = _pallas_forward(x2, ln_scale, w1, b1, w2, b2)
  elif ENABLE_FUSED_KERNEL:
    out = jax.lax.platform_dependent(
        x2, ln_scale, w1, b1, w2, b2,
        tpu=_pallas_forward,
        default=_math_reference,
    )
  else:
    out = _math_reference(x2, ln_scale, w1, b1, w2, b2)
  return out.reshape(lead + (c,))


def _fwd(x, ln_scale, w1, b1, w2, b2):
  return mlp_block(x, ln_scale, w1, b1, w2, b2), (
      x, ln_scale, w1, b1, w2, b2,
  )


def _bwd(res, g):
  x, ln_scale, w1, b1, w2, b2 = res
  lead = x.shape[:-1]
  c = x.shape[-1]
  _, vjp = jax.vjp(
      _math_reference, x.reshape(-1, c), ln_scale, w1, b1, w2, b2
  )
  grads = vjp(g.reshape(-1, c))
  return (grads[0].reshape(lead + (c,)),) + grads[1:]


mlp_block.defvjp(_fwd, _bwd)
