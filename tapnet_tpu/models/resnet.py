"""ResNet feature backbone (Flax), v1/v2 with pluggable normalization.

Capability-parity with the reference backbone (tapnet/models/resnet.py:27-471):
v1/v2 residual blocks, optional bottleneck, batch/layer/instance/no norm,
per-group feature outputs. TAPIR uses the v2 + InstanceNorm configuration with
strides (1, 2, 2, 1), channels (64, 128, 256, 256) and no max-pool, giving a
stride-4 128-ch "hires" map (group 1) and a stride-8 256-ch "lowres" map
(group 3).

BatchNorm uses `axis_name="data"` so batch statistics sync across the data
axis of the device mesh when one is active (the reference's cross-replica BN).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.models.layers import InstanceNorm

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
  blocks_per_group: Sequence[int] = (2, 2, 2, 2)
  channels_per_group: Sequence[int] = (64, 128, 256, 256)
  use_projection: Sequence[bool] = (True, True, True, True)
  strides: Sequence[int] = (1, 2, 2, 1)
  bottleneck: bool = False
  resnet_v2: bool = True
  normalization: Optional[str] = "instancenorm"
  use_max_pool: bool = False
  stem_channels: int = 64
  stem_kernel: int = 7
  stem_stride: int = 2
  # Inference speed mode: run the residual-block convolutions (incl.
  # projections) in w8a8 int8 (ops/qconv.py; 2x MXU rate on v5e, int32
  # accumulation, straight-through backward). The stem conv stays full
  # precision: its 3-channel input pads to 128 MXU lanes either way, and
  # first-layer quantization is the most accuracy-sensitive. Norms, relus
  # and residual adds stay in the compute dtype. The parameter tree is
  # identical to the full-precision model, so checkpoints load in either
  # mode. Opt-in; drift documented in PERFORMANCE.md.
  quantized: bool = False


class _QConv(nn.Module):
  """Bias-free w8a8 int8 conv with an nn.Conv-identical parameter tree
  (kernel [kh, kw, C_in, C_out] under the module name), so released
  checkpoints load interchangeably with the full-precision blocks."""

  features: int
  kernel_size: Tuple[int, int]
  strides: int = 1

  @nn.compact
  def __call__(self, x: Array) -> Array:
    from tapnet_tpu.ops import qconv

    kh, kw = self.kernel_size
    kernel = self.param(
        "kernel",
        nn.initializers.lecun_normal(),
        (kh, kw, x.shape[-1], self.features),
    )
    zero_bias = jnp.zeros((self.features,), jnp.float32)
    return qconv.conv2d_q8(
        x, kernel, zero_bias, (self.strides, self.strides)
    )


def _conv_layer(features, kernel_size, strides, name, quantized):
  """nn.Conv (full precision) or its int8 twin, same parameter path."""
  if quantized:
    return _QConv(features, kernel_size, strides=strides, name=name)
  return nn.Conv(
      features,
      kernel_size,
      strides=strides,
      use_bias=False,
      padding="SAME",
      name=name,
  )


def _make_norm(normalization: Optional[str], name: str, axis_name=None):
  """Builds a norm layer matching the reference conventions."""
  if normalization == "instancenorm":
    return InstanceNorm(name=name)
  if normalization == "layernorm":
    # Reference uses axis [-1, -2, -3]: normalize over H, W, C jointly.
    return nn.LayerNorm(
        epsilon=1e-5, reduction_axes=(-3, -2, -1), name=name
    )
  if normalization == "batchnorm":
    return nn.BatchNorm(
        momentum=0.9, epsilon=1e-5, axis_name=axis_name, name=name
    )
  if normalization is None:
    return None
  raise ValueError(f"Unknown normalization: {normalization!r}")


class BlockV2(nn.Module):
  """Pre-activation residual block (norm -> relu -> conv), projection taken
  from the post-activation input."""

  channels: int
  stride: int
  use_projection: bool
  bottleneck: bool
  normalization: Optional[str]
  bn_axis_name: Optional[str] = None
  quantized: bool = False

  @nn.compact
  def __call__(self, x: Array, is_training: bool = False) -> Array:
    inner = self.channels // (4 if self.bottleneck else 1)
    if self.bottleneck:
      convs = (
          dict(features=inner, kernel_size=(1, 1), strides=1, name="conv_0"),
          dict(
              features=inner,
              kernel_size=(3, 3),
              strides=self.stride,
              name="conv_1",
          ),
          dict(features=self.channels, kernel_size=(1, 1), strides=1,
               name="conv_2"),
      )
    else:
      convs = (
          dict(
              features=inner,
              kernel_size=(3, 3),
              strides=self.stride,
              name="conv_0",
          ),
          dict(features=self.channels, kernel_size=(3, 3), strides=1,
               name="conv_1"),
      )

    shortcut = x
    h = x
    for i, conv_kwargs in enumerate(convs):
      norm = _make_norm(self.normalization, f"norm_{i}", self.bn_axis_name)
      if norm is not None:
        if self.normalization == "batchnorm":
          h = norm(h, use_running_average=not is_training)
        else:
          h = norm(h)
      h = jax.nn.relu(h)
      if i == 0 and self.use_projection:
        shortcut = _conv_layer(
            self.channels,
            (1, 1),
            strides=self.stride,
            name="proj_conv",
            quantized=self.quantized,
        )(h)
      h = _conv_layer(quantized=self.quantized, **conv_kwargs)(h)
    return h + shortcut


class BlockV1(nn.Module):
  """Post-activation residual block (conv -> norm -> relu)."""

  channels: int
  stride: int
  use_projection: bool
  bottleneck: bool
  normalization: Optional[str]
  bn_axis_name: Optional[str] = None
  quantized: bool = False

  @nn.compact
  def __call__(self, x: Array, is_training: bool = False) -> Array:
    inner = self.channels // (4 if self.bottleneck else 1)
    if self.bottleneck:
      convs = (
          dict(features=inner, kernel_size=(1, 1), strides=1, name="conv_0"),
          dict(features=inner, kernel_size=(3, 3), strides=self.stride,
               name="conv_1"),
          dict(features=self.channels, kernel_size=(1, 1), strides=1,
               name="conv_2"),
      )
    else:
      convs = (
          dict(features=inner, kernel_size=(3, 3), strides=self.stride,
               name="conv_0"),
          dict(features=self.channels, kernel_size=(3, 3), strides=1,
               name="conv_1"),
      )

    def apply_norm(h, name):
      norm = _make_norm(self.normalization, name, self.bn_axis_name)
      if norm is None:
        return h
      if self.normalization == "batchnorm":
        return norm(h, use_running_average=not is_training)
      return norm(h)

    shortcut = x
    if self.use_projection:
      shortcut = _conv_layer(
          self.channels,
          (1, 1),
          strides=self.stride,
          name="proj_conv",
          quantized=self.quantized,
      )(shortcut)
      shortcut = apply_norm(shortcut, "proj_norm")

    h = x
    for i, conv_kwargs in enumerate(convs):
      h = _conv_layer(quantized=self.quantized, **conv_kwargs)(h)
      h = apply_norm(h, f"norm_{i}")
      if i < len(convs) - 1:
        h = jax.nn.relu(h)
    return jax.nn.relu(h + shortcut)


class ResNet(nn.Module):
  """ResNet returning a dict of per-group feature maps {"group_0"... "group_3"}."""

  config: ResNetConfig = ResNetConfig()
  bn_axis_name: Optional[str] = None

  @nn.compact
  def __call__(self, x: Array, is_training: bool = False):
    cfg = self.config
    x = nn.Conv(
        cfg.stem_channels,
        (cfg.stem_kernel, cfg.stem_kernel),
        strides=cfg.stem_stride,
        use_bias=False,
        padding="SAME",
        name="stem_conv",
    )(x)
    if not cfg.resnet_v2:
      norm = _make_norm(cfg.normalization, "stem_norm", self.bn_axis_name)
      if norm is not None:
        if cfg.normalization == "batchnorm":
          x = norm(x, use_running_average=not is_training)
        else:
          x = norm(x)
      x = jax.nn.relu(x)
    if cfg.use_max_pool:
      x = nn.max_pool(
          x, window_shape=(3, 3), strides=(2, 2), padding="SAME"
      )

    block_cls = BlockV2 if cfg.resnet_v2 else BlockV1
    outputs = {}
    for g, (channels, num_blocks, stride, proj) in enumerate(
        zip(
            cfg.channels_per_group,
            cfg.blocks_per_group,
            cfg.strides,
            cfg.use_projection,
        )
    ):
      for b in range(num_blocks):
        x = block_cls(
            channels=channels,
            stride=stride if b == 0 else 1,
            use_projection=proj if b == 0 else False,
            bottleneck=cfg.bottleneck,
            normalization=cfg.normalization,
            bn_axis_name=self.bn_axis_name,
            quantized=cfg.quantized,
            name=f"group_{g}_block_{b}",
        )(x, is_training)
      outputs[f"group_{g}"] = x
    return outputs
