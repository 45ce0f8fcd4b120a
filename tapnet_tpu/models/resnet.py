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
from typing import Optional, Sequence

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
  # NOTE: an int8 (w8a8) backbone mode existed briefly and was REMOVED after
  # end-to-end measurement (scratch/bench_fast_variants.py): the backbone is
  # HBM-bound (group0 at ~70% HBM / 22% MXU), so the 1.7x int8 conv rate
  # from the microbenchmark bought nothing — 1.094 -> 1.098 s on the fast
  # 480p config and 1.622 -> 1.654 s on the default config. See
  # PERFORMANCE.md dead ends.


def _conv_layer(features, kernel_size, strides, name):
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
        )(h)
      h = _conv_layer(**conv_kwargs)(h)
    return h + shortcut


class BlockV1(nn.Module):
  """Post-activation residual block (conv -> norm -> relu)."""

  channels: int
  stride: int
  use_projection: bool
  bottleneck: bool
  normalization: Optional[str]
  bn_axis_name: Optional[str] = None

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
      )(shortcut)
      shortcut = apply_norm(shortcut, "proj_norm")

    h = x
    for i, conv_kwargs in enumerate(convs):
      h = _conv_layer(**conv_kwargs)(h)
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
            name=f"group_{g}_block_{b}",
        )(x, is_training)
      outputs[f"group_{g}"] = x
    return outputs
