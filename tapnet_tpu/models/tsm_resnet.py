"""TSM-ResNet: ResNet-V2 with Temporal Shift Modules (Flax).

Behavioral parity: tapnet/models/tsm_resnet.py + tsm_utils.py. A fraction of
channels is shifted one frame forward/backward before the residual convs,
giving temporal receptive field without 3D convs.

TPU-first: activations are kept time-major [T*B, H, W, C] throughout, so the
temporal shift is a slice along the leading axis (contiguous in memory, no
[B, T] <-> [B*T] transposes), and the shifted tensors are combined by
masked sum which XLA fuses into the surrounding convolution. The resulting
channel order [future-shifted | static | past-shifted] matches the reference
(tsm_utils.py:149-215), so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def temporal_shift(
    x: Array, num_frames: int, channel_shift_fraction: float = 0.125
) -> Array:
  """Shift channels across time; x is time-major [T*B, H, W, C].

  Output channels: [last n channels from t+1 | middle channels from t |
  first n channels from t-1] (the reference's order).
  """
  tb, h, w, c = x.shape
  b = tb // num_frames
  n = int(c * channel_shift_fraction)
  if n == 0:
    return x
  zeros = jnp.zeros((b, h, w, c), x.dtype)
  future = jnp.concatenate([x[b:], zeros], axis=0)
  past = jnp.concatenate([zeros, x[:-b]], axis=0)
  return jnp.concatenate(
      [future[..., c - n :], x[..., n : c - n], past[..., :n]], axis=-1
  )


def temporal_shift_image_mode(
    x: Array, channel_shift_fraction: float = 0.125, alpha: float = 0.3
) -> Array:
  """Single-image ("deflated") TSM: emulates a static video
  (reference: tsm_utils.py:98-111)."""
  c = x.shape[-1]
  n = int(c * channel_shift_fraction)
  if n == 0:
    return x
  return jnp.concatenate(
      [alpha * x[..., c - n :], x[..., n : c - n], alpha * x[..., :n]],
      axis=-1,
  )


@dataclasses.dataclass(frozen=True)
class TSMResNetConfig:
  depth: int = 18
  channel_shift_fraction: Union[float, Sequence[float]] = (
      0.125, 0.125, 0.0, 0.0
  )
  width_mult: int = 1
  output_stride: int = 8

  def resolved(self):
    num_blocks = {
        18: (2, 2, 2, 2),
        34: (3, 4, 6, 3),
        50: (3, 4, 6, 3),
        101: (3, 4, 23, 3),
        152: (3, 8, 36, 3),
        200: (3, 24, 36, 3),
    }[self.depth]
    fractions = self.channel_shift_fraction
    if isinstance(fractions, float):
      fractions = (fractions,) * 4
    strides = {
        4: (1, 1, 1, 1),
        8: (1, 2, 1, 1),
        16: (1, 2, 2, 1),
        32: (1, 2, 2, 2),
    }[self.output_stride]
    rates = {
        4: (1, 2, 4, 8),
        8: (1, 1, 2, 4),
        16: (1, 1, 1, 2),
        32: (1, 1, 1, 1),
    }[self.output_stride]
    return num_blocks, tuple(fractions), strides, rates, self.depth >= 50


class TSMBlock(nn.Module):
  """Pre-activation residual block with temporal shift on the residual path."""

  output_channels: int
  stride: int
  use_projection: bool
  bottleneck: bool
  num_frames: int
  channel_shift_fraction: float
  rate: int = 1
  deflation_alpha: Optional[float] = None

  @nn.compact
  def __call__(self, x: Array, is_training: bool = False) -> Array:
    out_c = self.output_channels if self.bottleneck else (
        self.output_channels // 4
    )
    mid_c = self.output_channels // 4

    preact = nn.BatchNorm(
        momentum=0.9,
        epsilon=1e-5,
        use_running_average=not is_training,
        axis_name=None,
        name="norm_pre",
    )(x)
    preact = jax.nn.relu(preact)

    if self.use_projection:
      shortcut = nn.Conv(
          out_c, (1, 1), strides=self.stride, use_bias=False,
          name="proj_conv",
      )(preact)
    else:
      shortcut = x

    if self.channel_shift_fraction != 0:
      if self.deflation_alpha is not None:
        preact = temporal_shift_image_mode(
            preact, self.channel_shift_fraction, self.deflation_alpha
        )
      else:
        preact = temporal_shift(
            preact, self.num_frames, self.channel_shift_fraction
        )

    h = nn.Conv(
        mid_c,
        (1, 1) if self.bottleneck else (3, 3),
        strides=1 if self.bottleneck else self.stride,
        use_bias=False,
        name="conv_0",
    )(preact)

    if self.bottleneck:
      h = nn.BatchNorm(
          momentum=0.9, epsilon=1e-5,
          use_running_average=not is_training, name="norm_0",
      )(h)
      h = jax.nn.relu(h)
      h = nn.Conv(
          mid_c, (3, 3), strides=self.stride,
          kernel_dilation=self.rate, use_bias=False, name="conv_1",
      )(h)

    h = nn.BatchNorm(
        momentum=0.9, epsilon=1e-5,
        use_running_average=not is_training, name="norm_1",
    )(h)
    h = jax.nn.relu(h)
    h = nn.Conv(
        out_c,
        (1, 1) if self.bottleneck else (3, 3),
        strides=1,
        use_bias=False,
        name="conv_2",
    )(h)
    return shortcut + h


class TSMResNetV2(nn.Module):
  """TSM ResNet-V2 over time-major [T*B, H, W, C] frames.

  `__call__` takes [B, T, H, W, 3] video (converted to time-major
  internally) or pre-flattened [T*B, H, W, 3] with `num_frames` given.
  Returns the endpoint feature map as [B, T, H', W', C'].
  """

  config: TSMResNetConfig = TSMResNetConfig()

  @nn.compact
  def __call__(
      self,
      video: Array,
      is_training: bool = False,
      final_endpoint: str = "unit_2",
      num_frames: Optional[int] = None,
      deflation_alpha: Optional[float] = None,
  ) -> Array:
    num_blocks, fractions, strides, rates, bottleneck = (
        self.config.resolved()
    )
    channels = tuple(
        c * self.config.width_mult for c in (256, 512, 1024, 2048)
    )

    if video.ndim == 5:
      b, t = video.shape[:2]
      num_frames = t
      # time-major flatten: [T*B, H, W, C]
      x = video.transpose(1, 0, 2, 3, 4).reshape(
          (t * b,) + video.shape[2:]
      )
    else:
      if num_frames is None:
        raise ValueError("num_frames required for pre-flattened input.")
      t = num_frames
      b = video.shape[0] // t
      x = video

    x = nn.Conv(
        64 * self.config.width_mult,
        (7, 7),
        strides=2,
        use_bias=False,
        padding="SAME",
        name="stem_conv",
    )(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

    def unflatten(v):
      return v.reshape((t, b) + v.shape[1:]).transpose(1, 0, 2, 3, 4)

    if final_endpoint == "stem":
      return unflatten(x)

    for unit_id in range(4):
      for block_id in range(num_blocks[unit_id]):
        x = TSMBlock(
            output_channels=channels[unit_id],
            stride=strides[unit_id] if block_id == 0 else 1,
            rate=(
                max(rates[unit_id] // 2, 1)
                if block_id == 0
                else rates[unit_id]
            ),
            use_projection=block_id == 0,
            bottleneck=bottleneck,
            num_frames=t,
            channel_shift_fraction=fractions[unit_id],
            deflation_alpha=deflation_alpha,
            name=f"unit_{unit_id}_block_{block_id}",
        )(x, is_training)
      if final_endpoint == f"unit_{unit_id}":
        return unflatten(x)

    x = nn.BatchNorm(
        momentum=0.9, epsilon=1e-5,
        use_running_average=not is_training, name="final_norm",
    )(x)
    x = jax.nn.relu(x)
    if final_endpoint == "last_conv":
      return unflatten(x)
    # Embeddings: average over space and time.
    x = x.mean(axis=(1, 2))
    x = x.reshape(t, b, -1).mean(axis=0)
    if final_endpoint != "embeddings":
      raise ValueError(f"Unknown endpoint {final_endpoint!r}")
    return x
