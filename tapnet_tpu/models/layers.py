"""Shared neural-net layers for TAP models (Flax).

Numerics match the reference's Haiku layers (tapnet/models/tapir_model.py:33-186)
so that released checkpoints can be imported bit-compatibly, but the modules
are organised for TPU execution: the temporal depthwise convolutions carry an
explicit, typed streaming cache (instead of name-keyed dicts), and all blocks
take [batch*points, time, channels] time-major inputs.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class InstanceNorm(nn.Module):
  """Per-sample, per-channel normalization over spatial dims.

  Matches hk.InstanceNorm(create_scale=True, create_offset=True): for an
  [..., H, W, C] input, mean/variance are taken over (H, W).
  """

  eps: float = 1e-5

  @nn.compact
  def __call__(self, x: Array) -> Array:
    # Statistics always in fp32 (bf16 activations would lose too much).
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(-3, -2), keepdims=True)
    var = jnp.var(xf, axis=(-3, -2), keepdims=True)
    scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
    offset = self.param("offset", nn.initializers.zeros, (x.shape[-1],))
    out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + offset
    return out.astype(x.dtype)


def layer_norm(x: Array, name: str, use_bias: bool = False) -> Array:
  """LayerNorm over the channel axis; scale-only by default (reference
  behavior: tapir_model.py:33-36)."""
  return nn.LayerNorm(epsilon=1e-5, use_bias=use_bias, name=name)(x)


class ConvCache(NamedTuple):
  """Streaming cache for one temporal-mixing block.

  `pre` holds the last (kernel-1) input frames of the first depthwise conv;
  `mid` the last (kernel-1) post-GELU frames feeding the second. Leading axes
  are whatever batch layout the caller uses (typically [B, N] or [B*N]).
  """

  pre: Array  # [..., kernel-1, hidden]
  mid: Array  # [..., kernel-1, hidden * multiplier]


class TemporalDepthwiseBlock(nn.Module):
  """Depthwise temporal mixing: per-channel conv -> GELU -> per-channel conv,
  with a 4x channel expansion folded back by summation.

  Channel semantics (must match the reference for checkpoint import,
  tapir_model.py:39-89): the first conv has channel_multiplier 4, so channels
  [4c, 4c+3] of the hidden all derive from input channel c; the output sums
  those four lanes back into channel c.
  """

  kernel_size: int = 3
  multiplier: int = 4
  causal: bool = False

  @nn.compact
  def __call__(
      self,
      x: Array,
      cache: Optional[ConvCache] = None,
      return_cache: bool = False,
  ) -> Tuple[Array, Optional[ConvCache]]:
    """Args:
      x: [..., T, C] time-major-in-last-two features.
      cache: optional streaming cache; when provided, convolutions run in
        VALID mode over [cache ++ x] (exact causal streaming).
      return_cache: whether to emit the updated cache.

    Returns:
      (y [..., T, C], new_cache or None)
    """
    k = self.kernel_size
    c = x.shape[-1]

    conv_up = nn.Conv(
        features=c * self.multiplier,
        kernel_size=(k,),
        feature_group_count=c,
        padding="VALID",
        name="dw_up",
    )
    conv_mix = nn.Conv(
        features=c * self.multiplier,
        kernel_size=(k,),
        feature_group_count=c * self.multiplier,
        padding="VALID",
        name="dw_mix",
    )

    def pad_causal(v):
      pads = [(0, 0)] * (v.ndim - 2) + [(k - 1, 0), (0, 0)]
      return jnp.pad(v, pads)

    def pad_same(v):
      left = (k - 1) // 2
      pads = [(0, 0)] * (v.ndim - 2) + [(left, k - 1 - left), (0, 0)]
      return jnp.pad(v, pads)

    new_cache = None
    if cache is not None:
      pre_in = jnp.concatenate([cache.pre, x], axis=-2)
      h = jax.nn.gelu(conv_up(pre_in))
      mid_in = jnp.concatenate([cache.mid, h], axis=-2)
      y = conv_mix(mid_in)
      if return_cache:
        new_cache = ConvCache(
            pre=pre_in[..., -(k - 1):, :], mid=mid_in[..., -(k - 1):, :]
        )
    else:
      padded = pad_causal(x) if self.causal else pad_same(x)
      h = jax.nn.gelu(conv_up(padded))
      y = conv_mix(pad_causal(h) if self.causal else pad_same(h))
      if return_cache:
        # Warm-up: derive a streaming cache from the tail of a full clip.
        new_cache = ConvCache(
            pre=x[..., -(k - 1):, :], mid=h[..., -(k - 1):, :]
        )

    # Fold the 4 expanded lanes of each input channel back together.
    y = y.reshape(y.shape[:-1] + (c, self.multiplier)).sum(axis=-1)
    return y, new_cache


class MixerBlock(nn.Module):
  """One PIPs-mixer block: temporal depthwise mixing + channel MLP,
  both with pre-LayerNorm residuals (reference: tapir_model.py:101-124)."""

  kernel_size: int = 3
  causal: bool = False
  expansion: int = 4

  @nn.compact
  def __call__(
      self,
      x: Array,
      cache: Optional[ConvCache] = None,
      return_cache: bool = False,
  ) -> Tuple[Array, Optional[ConvCache]]:
    c = x.shape[-1]
    h = layer_norm(x, "ln_temporal")
    h, new_cache = TemporalDepthwiseBlock(
        kernel_size=self.kernel_size, causal=self.causal, name="temporal"
    )(h, cache, return_cache)
    x = x + h

    h = layer_norm(x, "ln_channel")
    h = nn.Dense(c * self.expansion, name="fc_up")(h)
    h = jax.nn.gelu(h)
    h = nn.Dense(c, name="fc_down")(h)
    return x + h, new_cache


class MixerCache(NamedTuple):
  """Stacked streaming cache for all mixer blocks: arrays with a leading
  `num_blocks` axis (pre: [L, ..., k-1, hidden], mid: [L, ..., k-1, 4*hidden])."""

  pre: Array
  mid: Array


class PipsMixer(nn.Module):
  """Depthwise-conv MLP-Mixer over trajectories (reference PIPSMLPMixer,
  tapir_model.py:127-156): input projection, N mixer blocks, LayerNorm,
  output projection."""

  output_channels: int
  hidden_dim: int = 512
  num_blocks: int = 12
  kernel_size: int = 3
  causal: bool = False

  @nn.compact
  def __call__(
      self,
      x: Array,
      cache: Optional[MixerCache] = None,
      return_cache: bool = False,
  ) -> Tuple[Array, Optional[MixerCache]]:
    x = nn.Dense(self.hidden_dim, name="in_proj")(x)
    new_pre, new_mid = [], []
    for i in range(self.num_blocks):
      block_cache = (
          ConvCache(pre=cache.pre[i], mid=cache.mid[i])
          if cache is not None
          else None
      )
      x, nc = MixerBlock(
          kernel_size=self.kernel_size, causal=self.causal, name=f"block_{i}"
      )(x, block_cache, return_cache)
      if return_cache:
        new_pre.append(nc.pre)
        new_mid.append(nc.mid)
    x = layer_norm(x, "ln_out")
    out = nn.Dense(self.output_channels, name="out_proj")(x)
    new_cache = (
        MixerCache(pre=jnp.stack(new_pre), mid=jnp.stack(new_mid))
        if return_cache
        else None
    )
    return out, new_cache

  def init_cache(self, batch_shape, dtype=jnp.float32) -> MixerCache:
    """Zero streaming cache for `batch_shape` leading dims."""
    k = self.kernel_size - 1
    return MixerCache(
        pre=jnp.zeros(
            (self.num_blocks,) + tuple(batch_shape) + (k, self.hidden_dim),
            dtype,
        ),
        mid=jnp.zeros(
            (self.num_blocks,) + tuple(batch_shape) + (k, self.hidden_dim * 4),
            dtype,
        ),
    )


class ExtraConvs(nn.Module):
  """Extra conv stack appended after the backbone (BootsTAPIR;
  reference: tapir_model.py:159-186). Residual 3x3 convs with 4x expansion
  and zero-initialised output convs. NOTE: the LayerNorm (with offset) sits
  in the *main* path — each layer normalizes x before adding the residual.
  """

  num_layers: int = 5
  channel_multiplier: int = 4
  use_tsm: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    # x: [T, H, W, C] (single video) or [B*T, H, W, C] when use_tsm=False.
    for i in range(self.num_layers):
      x = layer_norm(x, f"ln_{i}", use_bias=True)
      if self.use_tsm:
        prev = jnp.concatenate([x[0:1], x[:-1]], axis=0)
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        resid = jnp.concatenate([x, prev, nxt], axis=-1)
      else:
        resid = x
      resid = nn.Conv(
          x.shape[-1] * self.channel_multiplier, (3, 3), name=f"conv_up_{i}"
      )(resid)
      resid = jax.nn.gelu(resid)
      x = x + nn.Conv(
          x.shape[-1],
          (3, 3),
          kernel_init=nn.initializers.zeros,
          name=f"conv_out_{i}",
      )(resid)
    return x
