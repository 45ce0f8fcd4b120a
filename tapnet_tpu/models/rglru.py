"""Griffin/Hawk recurrent block: RG-LRU + causal conv + gated MLP (Flax).

This replaces the reference's `recurrentgemma` dependency
(tapnet/models/ssm_vit.py:169-182; torch spec: tapnext_lru_modules.py) with a
self-contained TPU-first implementation:

  * The linear recurrence h[t] = a[t] * h[t-1] + x[t] runs as a parallel
    `associative_scan` over time (log-depth, XLA-fused on TPU) with fp32
    carries and bf16-safe IO; a one-step branch serves streaming decode.
  * `sqrt(1 - a^2)` input normalization uses a gradient-clipped custom VJP
    (the reference's SqrtBoundDerivative) so bf16 training can't NaN.

Parameter names/shapes match the released TAPNext checkpoints
(`.../ssm_block/recurrent_block/rg_lru/a_param` etc., see
tapnext_torch_utils.py:81-93), so importing them is pure key reshaping.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray

_MAX_SQRT_GRADIENT = 1000.0


@jax.custom_vjp
def sqrt_bound_derivative(x: Array) -> Array:
  """sqrt(x) with the backward pass clipped at `_MAX_SQRT_GRADIENT`."""
  return jnp.sqrt(x)


def _sqrt_fwd(x):
  return jnp.sqrt(x), x


def _sqrt_bwd(x, g):
  clipped = jnp.clip(4.0 * x, min=1 / (_MAX_SQRT_GRADIENT**2))
  return (g / jnp.sqrt(clipped),)


sqrt_bound_derivative.defvjp(_sqrt_fwd, _sqrt_bwd)


class RMSNorm(nn.Module):
  """RMSNorm with a (1 + scale) multiplier (Griffin convention)."""

  eps: float = 1e-6

  @nn.compact
  def __call__(self, x: Array) -> Array:
    scale = self.param("scale", nn.initializers.zeros, (x.shape[-1],))
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    normed = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
    return normed * (scale + 1)


class BlockDiagonalLinear(nn.Module):
  """Per-head (block-diagonal) linear layer; params w [H, bw, bw], b [H, bw]."""

  num_blocks: int
  w_init_scale: float = 1.0

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    bw = c // self.num_blocks
    w = self.param(
        "w",
        nn.initializers.variance_scaling(
            self.w_init_scale, "fan_in", "truncated_normal"
        ),
        (self.num_blocks, bw, bw),
    )
    b = self.param("b", nn.initializers.zeros, (self.num_blocks, bw))
    xb = x.reshape(x.shape[:-1] + (self.num_blocks, bw))
    y = jnp.einsum("...hi,hij->...hj", xb, w) + b
    return y.reshape(x.shape)


def linear_recurrence(
    x: Array, a: Array, h0: Optional[Array] = None
) -> Tuple[Array, Array]:
  """Computes h[t] = a[t] * h[t-1] + x[t] over axis 1 (time).

  Dispatches to the Pallas TPU scan kernel (tapnet_tpu.ops.scan) on TPU and
  to a parallel associative scan elsewhere.

  Args:
    x: [B, T, C] inputs.
    a: [B, T, C] per-step decay in (0, 1).
    h0: optional [B, C] fp32 initial state.

  Returns:
    (y [B, T, C] in x.dtype, h_last [B, C] fp32)
  """
  from tapnet_tpu.ops import scan as scan_ops

  if h0 is None:
    h0 = jnp.zeros((x.shape[0], x.shape[-1]), jnp.float32)
  return scan_ops.linear_scan(x, a, h0)


def sp_active(sp, t: int) -> bool:
  """Whether the sequence-parallel path applies to a length-t sequence.

  `sp` is an optional (jax.sharding.Mesh, time_axis_name) pair. Streaming
  steps (t == 1) always take the local path; a multi-step sequence whose
  length the mesh axis does not divide is a configuration error.
  """
  if sp is None:
    return False
  mesh, axis = sp
  p = mesh.shape[axis]
  if p <= 1 or t == 1:
    return False
  if t % p:
    raise ValueError(
        f"sequence length {t} not divisible by mesh axis {axis!r} ({p})"
    )
  return True


class RGLRU(nn.Module):
  """Real-Gated Linear Recurrent Unit.

  a[t] = exp(-8 * sigmoid(a_gate(x)) * softplus(a_param));
  input gated by sigmoid(input_gate(x)) and normalized by sqrt(1 - a^2)
  (skipped at t=0 of a fresh sequence).
  """

  num_heads: int
  w_init_scale: float = 1.0
  # Optional (Mesh, time_axis) pair: run the recurrence time-sharded over
  # the mesh (parallel/sequence.py) instead of on one device.
  sp: Optional[Tuple] = None

  @nn.compact
  def __call__(
      self, x: Array, cache: Optional[Array] = None
  ) -> Tuple[Array, Array]:
    c = x.shape[-1]
    a_param = self.param(
        "a_param",
        # Griffin init: a uniformly in [0.9, 0.999] => a_param such that
        # softplus(a_param) = -log(a)/8.
        lambda key, shape: jnp.log(
            jnp.expm1(
                -jnp.log(
                    jax.random.uniform(key, shape, minval=0.9, maxval=0.999)
                )
                / 8.0
            )
        ),
        (c,),
    )
    gate_x = jax.nn.sigmoid(
        BlockDiagonalLinear(
            num_blocks=self.num_heads,
            w_init_scale=self.w_init_scale,
            name="input_gate",
        )(x)
    )
    gate_a = jax.nn.sigmoid(
        BlockDiagonalLinear(
            num_blocks=self.num_heads,
            w_init_scale=self.w_init_scale,
            name="a_gate",
        )(x)
    )
    log_a = -8.0 * gate_a * jax.nn.softplus(a_param)
    a = jnp.exp(log_a.astype(jnp.float32)).astype(x.dtype)
    a_square = jnp.exp(2 * log_a.astype(jnp.float32))

    gated_x = x * gate_x
    multiplier = sqrt_bound_derivative(1 - a_square)
    if cache is None:
      # Fresh sequence: no normalization at the first step.
      t_idx = jnp.arange(x.shape[1])[None, :, None]
      multiplier = jnp.where(t_idx == 0, 1.0, multiplier)
    normalized_x = gated_x * multiplier.astype(x.dtype)

    if sp_active(self.sp, x.shape[1]):
      from tapnet_tpu.parallel import sequence

      return sequence.sequence_parallel_linear_scan(
          normalized_x, a, cache, mesh=self.sp[0], time_axis=self.sp[1]
      )
    return linear_recurrence(normalized_x, a, cache)


class CausalConv1D(nn.Module):
  """Depthwise temporal conv of width `temporal_width` with streaming cache.

  Params: w [temporal_width, C], b [C] (the recurrentgemma layout).
  """

  temporal_width: int = 4
  w_init_scale: float = 0.01
  sp: Optional[Tuple] = None  # (Mesh, time_axis): see RGLRU.sp

  @nn.compact
  def __call__(
      self, x: Array, cache: Optional[Array] = None
  ) -> Tuple[Array, Array]:
    c = x.shape[-1]
    k = self.temporal_width
    w = self.param(
        "w",
        nn.initializers.variance_scaling(
            self.w_init_scale, "fan_in", "truncated_normal"
        ),
        (k, c),
    )
    b = self.param("b", nn.initializers.zeros, (c,))

    if sp_active(self.sp, x.shape[1]):
      from tapnet_tpu.parallel import sequence

      return sequence.sequence_parallel_causal_conv(
          x, w, b, cache, mesh=self.sp[0], time_axis=self.sp[1]
      )

    if cache is None:
      cache = jnp.zeros((x.shape[0], k - 1, c), x.dtype)
    full = jnp.concatenate([cache.astype(x.dtype), x], axis=1)

    if x.shape[1] == 1:
      y = jnp.einsum("btc,tc->bc", full, w)[:, None] + b
    else:
      # Depthwise conv as k shifted elementwise FMAs: feature-grouped convs
      # lower poorly on TPU, shift-and-add fuses on the VPU.
      t_out = full.shape[1] - (k - 1)
      y = jnp.zeros_like(x) + b
      for j in range(k):
        y = y + full[:, j : j + t_out] * w[j]
    new_cache = full[:, full.shape[1] - (k - 1):]
    return y, new_cache


class RecurrentBlockCache(NamedTuple):
  """Streaming state of one recurrent block (fp32 LRU state + conv window)."""

  rg_lru_state: Array  # [..., B, lru_width] fp32
  conv1d_state: Array  # [..., B, temporal_width - 1, lru_width]


class RecurrentBlock(nn.Module):
  """linear_y (gelu gate) || linear_x -> causal conv -> RG-LRU; join; out."""

  num_heads: int
  lru_width: Optional[int] = None
  conv1d_temporal_width: int = 4
  final_w_init_variance_scale: float = 1.0
  sp: Optional[Tuple] = None  # (Mesh, time_axis): see RGLRU.sp

  @nn.compact
  def __call__(
      self, x: Array, cache: Optional[RecurrentBlockCache] = None
  ) -> Tuple[Array, RecurrentBlockCache]:
    width = x.shape[-1]
    lru_width = self.lru_width or width

    y = nn.Dense(lru_width, name="linear_y")(x)
    y = jax.nn.gelu(y)

    h = nn.Dense(lru_width, name="linear_x")(x)
    h, conv_state = CausalConv1D(
        temporal_width=self.conv1d_temporal_width, name="conv_1d",
        sp=self.sp,
    )(h, None if cache is None else cache.conv1d_state)
    h, lru_state = RGLRU(
        num_heads=self.num_heads, name="rg_lru", sp=self.sp
    )(h, None if cache is None else cache.rg_lru_state)

    out = nn.Dense(
        width,
        name="linear_out",
        kernel_init=nn.initializers.variance_scaling(
            self.final_w_init_variance_scale, "fan_in", "truncated_normal"
        ),
    )(h * y)
    return out, RecurrentBlockCache(
        rg_lru_state=lru_state, conv1d_state=conv_state
    )

  @staticmethod
  def init_cache(
      batch_size: int,
      lru_width: int,
      dtype=jnp.float32,
      conv1d_temporal_width: int = 4,
  ) -> RecurrentBlockCache:
    return RecurrentBlockCache(
        rg_lru_state=jnp.zeros((batch_size, lru_width), jnp.float32),
        conv1d_state=jnp.zeros(
            (batch_size, conv1d_temporal_width - 1, lru_width), dtype
        ),
    )


class GriffinResidualBlock(nn.Module):
  """Griffin residual block: RMSNorm -> recurrent -> +res; RMSNorm -> MLP -> +res.

  Param tree matches the reference ssm_block exactly:
  temporal_pre_norm, recurrent_block/{linear_y,linear_x,linear_out,conv_1d,
  rg_lru}, channel_pre_norm, mlp_block/{ffw_up,ffw_down}.
  """

  mlp_expanded_width: int
  num_heads: int
  lru_width: Optional[int] = None
  conv1d_temporal_width: int = 4
  final_w_init_variance_scale: float = 1.0
  sp: Optional[Tuple] = None  # (Mesh, time_axis): see RGLRU.sp

  @nn.compact
  def __call__(
      self, x: Array, cache: Optional[RecurrentBlockCache] = None
  ) -> Tuple[Array, RecurrentBlockCache]:
    raw = x
    h = RMSNorm(name="temporal_pre_norm")(x)
    h, new_cache = RecurrentBlock(
        num_heads=self.num_heads,
        lru_width=self.lru_width,
        conv1d_temporal_width=self.conv1d_temporal_width,
        final_w_init_variance_scale=self.final_w_init_variance_scale,
        name="recurrent_block",
        sp=self.sp,
    )(h, cache)
    residual = h + raw
    h = RMSNorm(name="channel_pre_norm")(residual)
    h = GriffinMLP(
        expanded_width=self.mlp_expanded_width,
        final_w_init_variance_scale=self.final_w_init_variance_scale,
        name="mlp_block",
    )(h)
    return h + residual, new_cache


class GriffinMLP(nn.Module):
  """Gated feed-forward: ffw_up emits (gate, act); gelu(gate) * act -> down."""

  expanded_width: int
  final_w_init_variance_scale: float = 1.0

  @nn.compact
  def __call__(self, x: Array) -> Array:
    width = x.shape[-1]
    up = _FfwUp(expanded_width=self.expanded_width, name="ffw_up")(x)
    activations = jax.nn.gelu(up[0]) * up[1]
    return nn.Dense(
        width,
        name="ffw_down",
        kernel_init=nn.initializers.variance_scaling(
            self.final_w_init_variance_scale, "fan_in", "truncated_normal"
        ),
    )(activations)


class _FfwUp(nn.Module):
  """Paired up-projection einsum with params w [2, d, D], b [2, 1, 1, D]."""

  expanded_width: int

  @nn.compact
  def __call__(self, x: Array) -> Array:
    width = x.shape[-1]
    w = self.param(
        "w",
        nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", in_axis=(1,), out_axis=(2,)
        ),
        (2, width, self.expanded_width),
    )
    b = self.param(
        "b", nn.initializers.zeros, (2, 1, 1, self.expanded_width)
    )
    return jnp.einsum("...td,cdD->c...tD", x, w) + b
