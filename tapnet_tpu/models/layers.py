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
    # Stays the plain jnp formulation on purpose: a single-pass fused
    # Pallas kernel (scratch/instance_norm.py) measured 3x SLOWER than
    # XLA's convert+reduce+normalize fusions at the 480p backbone shapes.
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


def _scale_only_layer_norm(x: Array, scale: Array, eps: float = 1e-5) -> Array:
  """Functional scale-only LayerNorm (same math as flax nn.LayerNorm with
  use_bias=False: fp32 single-pass statistics)."""
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32)
  return out.astype(x.dtype)


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
  features: int = 512

  def setup(self):
    hidden = self.features * self.multiplier
    self.dw_up = _DepthwiseParams(
        features=hidden, kernel_size=self.kernel_size, name="dw_up"
    )
    self.dw_mix = _DepthwiseParams(
        features=hidden, kernel_size=self.kernel_size, name="dw_mix"
    )

  def weights(self):
    """(w_up, b_up, w_mix, b_mix) in conv layout, for fused kernels."""
    return self.dw_up() + self.dw_mix()

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

    The depthwise convolutions are computed as k shifted elementwise FMAs
    rather than feature-grouped convolutions: a conv with C (or 4C) groups
    lowers to scalar-ish work on TPU, while shift-and-add is pure VPU
    elementwise math that XLA fuses with the surrounding ops. Parameter
    shapes stay conv-layout ([k, 1, C*mult]) for checkpoint compatibility.
    """
    k = self.kernel_size
    c = x.shape[-1]
    assert c == self.features, (c, self.features)

    w_up, b_up, w_mix, b_mix = self.weights()

    def shifted_fma(v, w, b):
      """VALID depthwise conv over time as sum of k shifted slices.

      v: [..., T + k - 1, D]; w: [k, 1, D]; returns [..., T, D].
      """
      t_out = v.shape[-2] - (k - 1)
      out = b
      for j in range(k):
        out = out + v[..., j : j + t_out, :] * w[j, 0]
      return out

    def pad_time(v, left, right):
      pads = [(0, 0)] * (v.ndim - 2) + [(left, right), (0, 0)]
      return jnp.pad(v, pads)

    new_cache = None
    if cache is None and not return_cache:
      # Hot path (offline training/inference): per-lane math — the 4x
      # hidden lanes are never materialized via `repeat`; XLA fuses the
      # shifted FMAs (ops/mixer_math.py).
      from tapnet_tpu.ops import mixer_math

      flat = x.reshape((-1,) + x.shape[-2:])
      y = mixer_math.temporal_depthwise(
          flat, w_up, b_up, w_mix, b_mix, self.causal
      )
      return y.reshape(x.shape), None

    # Streaming / warm-up paths: materialize the hidden lanes (the caches
    # need them). Expand channels group-major: input channel c -> lanes
    # [4c, 4c+3], matching the grouped-conv output ordering.
    if cache is not None:
      pre_in = jnp.concatenate([cache.pre, x], axis=-2)
      pre_rep = jnp.repeat(pre_in, self.multiplier, axis=-1)
      h = jax.nn.gelu(shifted_fma(pre_rep, w_up, b_up))
      mid_in = jnp.concatenate([cache.mid, h], axis=-2)
      y = shifted_fma(mid_in, w_mix, b_mix)
      if return_cache:
        new_cache = ConvCache(
            pre=pre_in[..., -(k - 1):, :], mid=mid_in[..., -(k - 1):, :]
        )
    else:
      if self.causal:
        left, right = k - 1, 0
      else:
        left = (k - 1) // 2
        right = k - 1 - left
      x_rep = jnp.repeat(x, self.multiplier, axis=-1)
      h = jax.nn.gelu(shifted_fma(pad_time(x_rep, left, right), w_up, b_up))
      y = shifted_fma(pad_time(h, left, right), w_mix, b_mix)
      if return_cache:
        # Warm-up: derive a streaming cache from the tail of a full clip.
        new_cache = ConvCache(
            pre=x[..., -(k - 1):, :], mid=h[..., -(k - 1):, :]
        )

    # Fold the 4 expanded lanes of each input channel back together.
    y = y.reshape(y.shape[:-1] + (c, self.multiplier)).sum(axis=-1)
    return y, new_cache


class _DepthwiseParams(nn.Module):
  """Holds conv-layout params ([k, 1, D] kernel + [D] bias) under a scope
  named like the nn.Conv it replaces, so checkpoints stay compatible."""

  features: int
  kernel_size: int

  @nn.compact
  def __call__(self):
    kernel = self.param(
        "kernel",
        nn.initializers.lecun_normal(),
        (self.kernel_size, 1, self.features),
    )
    bias = self.param("bias", nn.initializers.zeros, (self.features,))
    return kernel, bias


class _DenseParams(nn.Module):
  """Holds Dense-layout params ([in, out] kernel + [out] bias) under a scope
  named like the nn.Dense it replaces, so checkpoints stay compatible."""

  in_features: int
  out_features: int

  @nn.compact
  def __call__(self):
    kernel = self.param(
        "kernel",
        nn.initializers.lecun_normal(),
        (self.in_features, self.out_features),
    )
    bias = self.param("bias", nn.initializers.zeros, (self.out_features,))
    return kernel, bias


class MixerBlock(nn.Module):
  """One PIPs-mixer block: temporal depthwise mixing + channel MLP,
  both with pre-LayerNorm residuals (reference: tapir_model.py:101-124)."""

  kernel_size: int = 3
  causal: bool = False
  expansion: int = 4
  # Semantic time length when the caller pre-padded T (see PipsMixer).
  valid_len: Optional[int] = None
  # Run the channel MLP in w8a8 int8 (inference speed mode; the temporal
  # conv and LayerNorms stay full precision). Applies on both the fused and
  # unfused paths so numerics don't depend on the fused-kernel size gate.
  quantized: bool = False

  @nn.compact
  def __call__(
      self,
      x: Array,
      cache: Optional[ConvCache] = None,
      return_cache: bool = False,
  ) -> Tuple[Array, Optional[ConvCache]]:
    from tapnet_tpu.ops import fused_mixer_block, mixer_math

    c = x.shape[-1]
    ln1_scale = self.param_like_layer_norm("ln_temporal", c)
    temporal = TemporalDepthwiseBlock(
        kernel_size=self.kernel_size,
        causal=self.causal,
        features=c,
        name="temporal",
    )
    ln2_scale = self.param_like_layer_norm("ln_channel", c)
    w1, b1 = _DenseParams(c, c * self.expansion, name="fc_up")()
    w2, b2 = _DenseParams(c * self.expansion, c, name="fc_down")()

    if (
        fused_mixer_block.wants_fused(x)
        and cache is None
        and not return_cache
    ):
      # Hot path (offline, no streaming state): the whole block — both
      # LayerNorms, the temporal conv, and the channel MLP — as ONE fused
      # Pallas kernel; LN statistics, the 4x temporal lanes, and the MLP
      # hidden never touch HBM (ops/fused_mixer_block.py).
      wu, bu, wm, bm = temporal.weights()
      y = fused_mixer_block.mixer_block(
          x, ln1_scale, wu, bu, wm, bm, ln2_scale, w1, b1, w2, b2,
          self.causal, self.valid_len, self.quantized,
      )
      return y, None

    # The unfused path does not mask pad rows: valid_len is only ever set by
    # PipsMixer when it pre-pads T for the fused kernel, and the fused gate
    # above must have taken that padded input. If the gates ever diverge,
    # pad rows would leak conv bias into real rows — fail loudly instead.
    if self.valid_len is not None:
      raise ValueError(
          "MixerBlock got valid_len on the unfused path; the caller padded "
          "time for the fused kernel but the fused gate rejected the input."
      )
    h = _scale_only_layer_norm(x, ln1_scale)
    h, new_cache = temporal(h, cache, return_cache)
    x = x + h

    # Channel MLP with pre-LN and residual; XLA's own fusion of the plain
    # formulation beats a hand-fused kernel here (ops/mixer_math.py).
    if self.quantized:
      return mixer_math.mlp_block_q8(
          x, ln2_scale, w1, b1, w2, b2
      ), new_cache
    return mixer_math.mlp_block(x, ln2_scale, w1, b1, w2, b2), new_cache

  def param_like_layer_norm(self, name: str, features: int) -> Array:
    """Scale param under `<name>/scale`, identical to scale-only
    nn.LayerNorm."""

    class _Scale(nn.Module):
      @nn.compact
      def __call__(self):
        return self.param(
            "scale", nn.initializers.ones, (features,)
        )

    return _Scale(name=name)()


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
  quantized: bool = False

  @nn.compact
  def __call__(
      self,
      x: Array,
      cache: Optional[MixerCache] = None,
      return_cache: bool = False,
  ) -> Tuple[Array, Optional[MixerCache]]:
    from tapnet_tpu.ops import fused_mixer_block

    x = nn.Dense(self.hidden_dim, name="in_proj")(x)

    # When the fused block kernel is in play, pad T to the fp32 sublane
    # multiple ONCE for the whole stack (the kernel keeps pad rows exactly
    # zero, so blocks compose); per-block pad/slice costs ~15% of the
    # kernel's runtime at T=250.
    valid_len = None
    fused_path = (
        fused_mixer_block.wants_fused(x)
        and cache is None
        and not return_cache
    )
    if fused_path and x.shape[1] % 8 != 0:
      valid_len = x.shape[1]
      x = jnp.pad(x, ((0, 0), (0, -valid_len % 8), (0, 0)))

    new_pre, new_mid = [], []
    for i in range(self.num_blocks):
      block_cache = (
          ConvCache(pre=cache.pre[i], mid=cache.mid[i])
          if cache is not None
          else None
      )
      x, nc = MixerBlock(
          kernel_size=self.kernel_size,
          causal=self.causal,
          valid_len=valid_len,
          quantized=self.quantized,
          name=f"block_{i}",
      )(x, block_cache, return_cache)
      if return_cache:
        new_pre.append(nc.pre)
        new_mid.append(nc.mid)
    if valid_len is not None:
      x = x[:, :valid_len]
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


class _LnBiasParams(nn.Module):
  """scale+bias params under `<name>/{scale,bias}` — identical tree to
  nn.LayerNorm(use_bias=True)."""

  features: int

  @nn.compact
  def __call__(self):
    return (
        self.param("scale", nn.initializers.ones, (self.features,)),
        self.param("bias", nn.initializers.zeros, (self.features,)),
    )


class _ConvParams(nn.Module):
  """kernel+bias params under `<name>/{kernel,bias}` — identical tree to
  nn.Conv / _Conv3x3."""

  kernel_shape: Tuple[int, int, int, int]
  kernel_init: nn.initializers.Initializer = (
      nn.initializers.lecun_normal()
  )

  @nn.compact
  def __call__(self):
    return (
        self.param("kernel", self.kernel_init, self.kernel_shape),
        self.param(
            "bias", nn.initializers.zeros, (self.kernel_shape[-1],)
        ),
    )


def _ln_with_bias(x: Array, scale: Array, bias: Array,
                  eps: float = 1e-5) -> Array:
  """Functional LayerNorm with scale AND bias (same math as flax
  nn.LayerNorm(use_bias=True): fp32 single-pass statistics)."""
  xf = x.astype(jnp.float32)
  mu = jnp.mean(xf, axis=-1, keepdims=True)
  var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
  out = (xf - mu) * jax.lax.rsqrt(var + eps) * scale.astype(
      jnp.float32
  ) + bias.astype(jnp.float32)
  return out.astype(x.dtype)


class ExtraConvs(nn.Module):
  """Extra conv stack appended after the backbone (BootsTAPIR;
  reference: tapir_model.py:159-186). Residual 3x3 convs with 4x expansion
  and zero-initialised output convs. NOTE: the LayerNorm (with offset) sits
  in the *main* path — each layer normalizes x before adding the residual.

  `quantized` selects the w8a8 int8 inference mode (per-output-channel
  weight scales, int32 MXU accumulation — 2x MXU rate on v5e); LayerNorms,
  GELUs and the residual stream stay full precision everywhere:

    False        full-precision convolutions (exact).
    True         per-FRAME activation scales via XLA int8 convs
                 (ops/qconv.py) — the fastest mode; its feature error can
                 flip near-tied stage-1 cost-volume peaks (drift tail,
                 PERFORMANCE.md).
    "per_pixel"  per-PIXEL activation scales via the fused Pallas layer
                 kernel (ops/fused_extra_convs.py; only a tap-decomposed
                 kernel can dequantize per-pixel scales exactly) — sits
                 between True and False in both speed and accuracy
                 (measured: 167 / 199 / 245 ms for the 5-layer 480p
                 stack).
  """

  num_layers: int = 5
  channel_multiplier: int = 4
  use_tsm: bool = False
  quantized: "bool | str" = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    from tapnet_tpu.ops import fused_extra_convs, qconv

    per_pixel = self.quantized == "per_pixel"
    # x: [T, H, W, C] (single video) or [B*T, H, W, C] when use_tsm=False.
    c = x.shape[-1]
    for i in range(self.num_layers):
      g, b_ln = _LnBiasParams(c, name=f"ln_{i}")()
      in_ch = 3 * c if self.use_tsm else c
      wu, bu = _ConvParams(
          (3, 3, in_ch, c * self.channel_multiplier), name=f"conv_up_{i}"
      )()
      wo, bo = _ConvParams(
          (3, 3, c * self.channel_multiplier, c),
          kernel_init=nn.initializers.zeros,
          name=f"conv_out_{i}",
      )()

      if not self.use_tsm and fused_extra_convs.wants_fused(x, per_pixel):
        x = fused_extra_convs.extra_convs_layer(
            x, g, b_ln, wu, bu, wo, bo, True
        )
        continue

      x = _ln_with_bias(x, g, b_ln)
      if self.use_tsm:
        prev = jnp.concatenate([x[0:1], x[:-1]], axis=0)
        nxt = jnp.concatenate([x[1:], x[-1:]], axis=0)
        resid = jnp.concatenate([x, prev, nxt], axis=-1)
      else:
        resid = x
      # per_pixel falls back to the per-frame scheme below the fused-size
      # gate / off-TPU (the per-pixel contraction needs the kernel).
      conv = qconv.conv2d_q8 if self.quantized else qconv.conv2d_fp_math
      resid = jax.nn.gelu(conv(resid, wu, bu))
      x = x + conv(resid, wo, bo)
    return x
