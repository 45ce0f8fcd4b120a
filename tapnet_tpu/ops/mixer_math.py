"""Unfused (pure-jnp) production math for the PIPs-mixer sub-blocks.

These are the formulations XLA schedules best at small/medium shapes
(the fused whole-block Pallas kernel in ops/fused_mixer_block.py takes
over above its size gate). Two measured facts shape this module
(PERFORMANCE.md "Measured dead ends"):

- A fused Pallas kernel for the temporal depthwise pair alone was
  compile-pathological in Mosaic at production shapes (experiment kept in
  scratch/pallas_depthwise_mixer.py). The per-lane jnp loop below never
  materializes the 4x `repeat` of the input and fuses fully under XLA
  (2.2 ms per mixer call at the 480p shape).
- A fused LN+MLP Pallas kernel measured 22.5 ms vs 18.3 ms for XLA's own
  fusion of the plain formulation (experiment kept in
  scratch/pallas_fused_mlp.py) — per-tile weight DMA costs more than the
  hidden-activation round-trip it saves.

Both entry points recompute through jax.vjp of their own math in the
backward pass (fixed small arithmetic graphs; recomputation is cheaper
than saving the 4x hidden activations).

Reference semantics being matched: depthwise temporal conv pair
(/root/reference/tapnet/models/tapir_model.py:39-89) and the channel MLP
(tapir_model.py:92-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jnp.ndarray

_LN_EPS = 1e-5


def temporal_depthwise_math(x, w_up, b_up, w_mix, b_mix, causal: bool):
  """Per-lane jnp formulation (no 4x repeat materialization).

  depthwise conv (channel multiplier `mult`) -> GELU -> depthwise conv ->
  fold the `mult` lanes of each input channel back by summation.
  """
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def temporal_depthwise(x, w_up, b_up, w_mix, b_mix, causal: bool = False):
  """Depthwise-conv -> GELU -> depthwise-conv -> lane fold.

  Args:
    x: [B, T, C].
    w_up / w_mix: [k, 1, mult*C] conv-layout kernels.
    b_up / b_mix: [mult*C] biases.
    causal: causal (left-only) vs SAME padding.

  Returns:
    [B, T, C].
  """
  return temporal_depthwise_math(x, w_up, b_up, w_mix, b_mix, causal)


def _td_fwd(x, w_up, b_up, w_mix, b_mix, causal):
  return temporal_depthwise(x, w_up, b_up, w_mix, b_mix, causal), (
      x, w_up, b_up, w_mix, b_mix,
  )


def _td_bwd(causal, res, g):
  x, w_up, b_up, w_mix, b_mix = res
  _, vjp = jax.vjp(
      lambda *args: temporal_depthwise_math(*args, causal),
      x, w_up, b_up, w_mix, b_mix,
  )
  return vjp(g)


temporal_depthwise.defvjp(_td_fwd, _td_bwd)


def quantize_rows(x):
  """Symmetric per-row int8 quantization of fp32 activations.

  Returns (q int8 [..., C], scale fp32 [..., 1]) with q*scale ~= x.
  """
  amax = jnp.maximum(jnp.max(jnp.abs(x), axis=-1, keepdims=True), 1e-8)
  q = jnp.clip(jnp.round(x * (127.0 / amax)), -127.0, 127.0)
  return q.astype(jnp.int8), amax * (1.0 / 127.0)


def quantize_weight_cols(w):
  """Symmetric per-output-column int8 quantization of an [in, out] weight.

  Returns (q int8 [in, out], scale fp32 [out]).
  """
  wf = w.astype(jnp.float32)
  amax = jnp.max(jnp.abs(wf), axis=0)
  scale = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
  q = jnp.clip(jnp.round(wf / scale), -127.0, 127.0).astype(jnp.int8)
  return q, scale


def mlp_math_q8(x, ln_scale, w1q, s1, b1, w2q, s2, b2):
  """Quantized (w8a8) residual channel MLP, shared semantics with the fused
  kernel's quantized path: LN in fp32, symmetric per-row dynamic activation
  scales, per-output-column weight scales, int32 MXU accumulation, dequant +
  bias + GELU in fp32.

  Args:
    x: [..., C] tokens, any float dtype.
    ln_scale: [C] scale-only LayerNorm scale.
    w1q / w2q: int8 [C, H] / [H, C] pre-quantized weights.
    s1 / s2: fp32 [H] / [C] per-column weight scales.
    b1 / b2: [H] / [C] biases (float).

  Returns:
    [..., C], same dtype as x.
  """
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
  xn = (xf - mu) * jax.lax.rsqrt(var + _LN_EPS)
  xn = xn * ln_scale.astype(jnp.float32)
  xq, xs = quantize_rows(xn)
  acc = jnp.dot(xq, w1q, preferred_element_type=jnp.int32)
  h = acc.astype(jnp.float32) * (xs * s1) + b1.astype(jnp.float32)
  h = jax.nn.gelu(h)
  hq, hs = quantize_rows(h)
  acc2 = jnp.dot(hq, w2q, preferred_element_type=jnp.int32)
  y = acc2.astype(jnp.float32) * (hs * s2) + b2.astype(jnp.float32)
  return x + y.astype(x.dtype)


@jax.custom_vjp
def mlp_block_q8(x, ln_scale, w1, b1, w2, b2):
  """Residual channel MLP in w8a8 int8 (inference path).

  Same signature as `mlp_block`; weights are quantized on the fly
  (per-output-column scales — XLA hoists the quantization out of scan
  loops since it only depends on the loop-invariant params). The backward
  pass is a straight-through estimator: gradients flow through the
  full-precision math (quantization is inference-only; training with this
  block active optimizes the dequantized surrogate).
  """
  lead = x.shape[:-1]
  c = x.shape[-1]
  w1q, s1 = quantize_weight_cols(w1)
  w2q, s2 = quantize_weight_cols(w2)
  return mlp_math_q8(
      x.reshape(-1, c), ln_scale, w1q, s1, b1, w2q, s2, b2
  ).reshape(lead + (c,))


def _mlp_q8_fwd(x, ln_scale, w1, b1, w2, b2):
  return mlp_block_q8(x, ln_scale, w1, b1, w2, b2), (
      x, ln_scale, w1, b1, w2, b2,
  )


def _mlp_q8_bwd(res, g):
  x, ln_scale, w1, b1, w2, b2 = res
  lead = x.shape[:-1]
  c = x.shape[-1]
  _, vjp = jax.vjp(mlp_math, x.reshape(-1, c), ln_scale, w1, b1, w2, b2)
  grads = vjp(g.reshape(-1, c))
  return (grads[0].reshape(lead + (c,)),) + grads[1:]


mlp_block_q8.defvjp(_mlp_q8_fwd, _mlp_q8_bwd)


def mlp_math(x, ln_scale, w1, b1, w2, b2):
  """x + Dense(gelu(Dense(LN(x)))), bit-matching the unfused Flax modules:
  scale-only LN with fp32 statistics, fp32 matmul accumulation, IO in the
  input dtype."""
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


@jax.custom_vjp
def mlp_block(x, ln_scale, w1, b1, w2, b2):
  """Residual channel-MLP: x + Dense(gelu(Dense(LN(x)))).

  Args:
    x: [..., C] tokens (any leading shape).
    ln_scale: [C] LayerNorm scale (scale-only LN, eps 1e-5).
    w1: [C, H]; b1: [H]; w2: [H, C]; b2: [C].

  Returns:
    [..., C], same dtype as x.
  """
  lead = x.shape[:-1]
  c = x.shape[-1]
  return mlp_math(x.reshape(-1, c), ln_scale, w1, b1, w2, b2).reshape(
      lead + (c,)
  )


def _mlp_fwd(x, ln_scale, w1, b1, w2, b2):
  return mlp_block(x, ln_scale, w1, b1, w2, b2), (
      x, ln_scale, w1, b1, w2, b2,
  )


def _mlp_bwd(res, g):
  x, ln_scale, w1, b1, w2, b2 = res
  lead = x.shape[:-1]
  c = x.shape[-1]
  _, vjp = jax.vjp(mlp_math, x.reshape(-1, c), ln_scale, w1, b1, w2, b2)
  grads = vjp(g.reshape(-1, c))
  return (grads[0].reshape(lead + (c,)),) + grads[1:]


mlp_block.defvjp(_mlp_fwd, _mlp_bwd)
