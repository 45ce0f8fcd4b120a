"""TAP-Net: the original cost-volume baseline tracker (Flax).

Behavioral parity: tapnet/models/tapnet_model.py:44-280. TSM-ResNet18
features (stride 8) -> multi-head cost volume -> conv position head with
soft-argmax, and an occlusion head; no refinement stage.

The cost volume is computed time-major ([T, B*N, H, W, heads]) and queries
are processed in memory-bounding chunks, like TAPIR.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.models import tsm_resnet
from tapnet_tpu.utils import sampling, transforms

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TapNetConfig:
  feature_grid_stride: int = 8
  num_heads: int = 1
  softmax_temperature: float = 10.0
  depth: int = 18


class TapNetHeads(nn.Module):
  """Position + occlusion heads over a [T, BN, H, W, D] cost volume."""

  softmax_temperature: float = 10.0

  @nn.compact
  def __call__(self, cost_volume: Array):
    hid = jax.nn.relu(
        nn.Conv(16, (1, 3, 3), name="pos_conv")(cost_volume)
    )
    pos = nn.Conv(1, (1, 3, 3), name="pos_out")(hid)
    pos = jax.nn.softmax(
        pos * self.softmax_temperature, axis=(-2, -3)
    )
    occ = nn.Conv(32, (1, 3, 3), strides=(1, 2, 2), name="occ_conv")(hid)
    occ = occ.mean(axis=(-2, -3))
    occ = jax.nn.relu(nn.Dense(16, name="occ_dense")(occ))
    occ = nn.Dense(1, name="occ_out")(occ)
    return pos, occ


class TAPNet(nn.Module):
  """TAP-Net tracker."""

  config: TapNetConfig = TapNetConfig()

  def setup(self):
    self.backbone = tsm_resnet.TSMResNetV2(
        config=tsm_resnet.TSMResNetConfig(
            depth=self.config.depth,
            channel_shift_fraction=(0.125, 0.125, 0.0, 0.0),
            output_stride=self.config.feature_grid_stride,
        )
    )
    self.heads = TapNetHeads(
        softmax_temperature=self.config.softmax_temperature
    )

  def __call__(
      self,
      video: Array,
      query_points: Array,
      query_chunk_size: Optional[int] = None,
      is_training: bool = False,
      get_query_feats: bool = False,
      feature_grid: Optional[Array] = None,
  ) -> Mapping[str, Array]:
    """Args:
      video: [B, T, H, W, 3] in [-1, 1].
      query_points: [B, N, 3] (t, y, x) raster points.
      query_chunk_size: memory-bounding chunk over queries.
      is_training: training mode (affects batch statistics).
      get_query_feats: also return sampled per-query features.
      feature_grid: optionally reuse a precomputed grid.

    Returns:
      dict with tracks [B, N, T, 2], occlusion logits [B, N, T],
      feature_grid, and optionally query_feats.
    """
    cfg = self.config
    if feature_grid is None:
      latent = self.backbone(
          video, is_training=is_training, final_endpoint="unit_2"
      )
      feature_grid = latent * jax.lax.rsqrt(
          jnp.maximum(
              jnp.sum(jnp.square(latent), axis=-1, keepdims=True), 1e-12
          )
      )

    shape = video.shape
    position_in_grid = transforms.convert_grid_coordinates(
        query_points,
        shape[1:4],
        feature_grid.shape[1:4],
        coordinate_format="tyx",
    )
    interp_features = sampling.sample_grid_batched(
        feature_grid, position_in_grid
    )  # [B, N, C]

    out = {"feature_grid": feature_grid}
    if get_query_feats:
      out["query_feats"] = interp_features

    b, t, h, w, c = feature_grid.shape
    d = cfg.num_heads
    grid_heads = feature_grid.reshape(b, t, h, w, c // d, d)
    query_heads = interp_features.reshape(
        b, interp_features.shape[1], c // d, d
    )

    num_queries = query_points.shape[1]
    if query_chunk_size is None:
      query_chunk_size = num_queries

    all_pts, all_occ = [], []
    for start in range(0, num_queries, query_chunk_size):
      q = query_heads[:, start : start + query_chunk_size]
      qp = query_points[:, start : start + query_chunk_size]
      n = q.shape[1]

      # Time-major cost volume [T, B*N, H, W, D].
      cost = jnp.einsum(
          "bncd,bthwcd->tbnhwd",
          q,
          grid_heads,
          preferred_element_type=jnp.float32,
      )
      cost = cost.reshape(t, b * n, h, w, d)

      pos, occ = self.heads(cost)

      pos = pos[..., 0].reshape(t, b, n, h, w).transpose(1, 2, 0, 3, 4)
      points = sampling.heatmaps_to_points(
          pos, shape, query_points=qp
      )
      occ = occ.reshape(t, b, n).transpose(1, 2, 0)
      all_pts.append(points)
      all_occ.append(occ)

    out["tracks"] = jnp.concatenate(all_pts, axis=1)
    out["occlusion"] = jnp.concatenate(all_occ, axis=1)
    return out
