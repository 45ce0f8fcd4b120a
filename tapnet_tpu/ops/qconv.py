"""w8a8 int8 2-D convolution for inference (v5e MXU int8 runs at 2x bf16).

BootsTAPIR's ExtraConvs stack (reference: tapnet/models/tapir_model.py:159-186)
is ~43 TFLOP of 3x3 convolutions at the 480p north-star workload, running
near the bf16 MXU floor. XLA lowers int8 convs to the v5e MXU at ~1.7x the
bf16 rate (24.8 -> 14.5 ms at the production conv shape,
scratch/bench_int8_conv.py); end-to-end the fast 480p config drops
1.21 -> 1.10 s (PERFORMANCE.md). Everything around the convolutions
(LayerNorm, GELU, the residual adds) stays full precision.

Scheme (mirrors ops/mixer_math.mlp_math_q8): symmetric per-output-channel
weight scales, symmetric dynamic per-frame activation scales, int32 MXU
accumulation, dequantize + bias in fp32. The backward pass is a
straight-through estimator through the full-precision convolution —
quantization is an inference-time mode; training with it active optimizes
the dequantized surrogate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _conv(x, kernel, dtype_out, strides):
  return jax.lax.conv_general_dilated(
      x,
      kernel,
      window_strides=strides,
      padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"),
      preferred_element_type=dtype_out,
  )


def conv2d_fp_math(x, kernel, bias, strides=(1, 1)):
  """Plain SAME conv + bias, fp32 accumulation, IO in x.dtype."""
  y = _conv(x, kernel.astype(x.dtype), jnp.float32, strides)
  return (y + bias.astype(jnp.float32)).astype(x.dtype)


def conv2d_q8_math(x, kernel, bias, strides=(1, 1)):
  """w8a8 formulation: quantize activations per frame, weights per
  output channel, accumulate int32 on the MXU, dequantize in fp32."""
  kf = kernel.astype(jnp.float32)
  w_amax = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
  ws = jnp.maximum(w_amax, 1e-8) * (1.0 / 127.0)  # [C_out]
  wq = jnp.clip(jnp.round(kf / ws), -127.0, 127.0).astype(jnp.int8)

  xf = x.astype(jnp.float32)
  x_amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
  xs = jnp.maximum(x_amax, 1e-8) * (1.0 / 127.0)  # [N, 1, 1, 1]
  xq = jnp.clip(jnp.round(xf / xs), -127.0, 127.0).astype(jnp.int8)

  acc = _conv(xq, wq, jnp.int32, strides)
  y = acc.astype(jnp.float32) * (xs * ws) + bias.astype(jnp.float32)
  return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def conv2d_q8(x, kernel, bias, strides=(1, 1)):
  """SAME int8 convolution with straight-through backward.

  Args:
    x: [N, H, W, C_in] activations (any float dtype).
    kernel: [kh, kw, C_in, C_out] full-precision weights (quantized on the
      fly; XLA hoists the weight quantization out of loops since it only
      depends on loop-invariant params).
    bias: [C_out]. Pass zeros for bias-free convs (folds into the
      dequantize epilogue at no cost).
    strides: spatial window strides (static).

  Returns:
    [N, H', W', C_out], same dtype as x.
  """
  return conv2d_q8_math(x, kernel, bias, strides)


def _q8_fwd(x, kernel, bias, strides):
  # With nondiff_argnums, JAX passes the fwd rule the ORIGINAL argument
  # order (nondiff args are prepended only for the bwd rule).
  return conv2d_q8_math(x, kernel, bias, strides), (x, kernel, bias)


def _q8_bwd(strides, res, g):
  _, vjp = jax.vjp(
      lambda *a: conv2d_fp_math(*a, strides=strides), *res
  )
  return vjp(g)


conv2d_q8.defvjp(_q8_fwd, _q8_bwd)
