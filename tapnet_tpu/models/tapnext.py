"""TAPNext tracker: ViT-SSM backbone + quantized-coordinate heads (Flax).

Behavioral parity: tapnet/models/video_ssm_tracker.py. Coordinates are
predicted as 512 logits split into two 256-bin axes, decoded by a truncated
soft-argmax (threshold 20 bins, temperature 0.5, +0.5 raster offset).
Per-layer intermediate predictions support deep supervision.

Conventions (confirmed against the reference VOTS wrapper,
tapnextpp/votsp2026/utils.py:100-115): query points are (t, y, x); output
tracks are (y, x) in model raster coordinates.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.models import rglru, ssm_vit

Array = jnp.ndarray


@flax.struct.dataclass
class TrackerResults:
  tracks: Array  # [B, Q, T, 2] (y, x)
  track_logits: Array  # [B, Q, T, 512]
  visible_logits: Array  # [B, Q, T, 1]
  intermediate_tracks: Sequence[Array]
  intermediate_track_logits: Sequence[Array]
  intermediate_visible_logits: Sequence[Array]
  state: Optional[Any] = None

  @property
  def visible(self) -> Array:
    return (self.visible_logits > 0).astype(jnp.float32)


def _head_mlp(out_features: int, inner: int = 256) -> nn.Module:
  return nn.Sequential([
      nn.Dense(inner),
      nn.LayerNorm(),
      jax.nn.gelu,
      nn.Dense(inner),
      nn.LayerNorm(),
      jax.nn.gelu,
      nn.Dense(out_features),
  ])


class TAPNextTracker(nn.Module):
  """TAPNext point tracker."""

  config: ssm_vit.SsmVitConfig = ssm_vit.SsmVitConfig()
  soft_argmax_threshold: int = 20
  softmax_temperature: float = 0.5

  def setup(self):
    self.backbone = ssm_vit.MaskedSequenceDecoder(config=self.config)
    self.visible_head = _head_mlp(1)
    self.coordinate_head = _head_mlp(512)

  def prediction_heads(self, query_feats: Array):
    """[B, T, Q, C] features -> (tracks, track_logits, visible_logits),
    each [B, T, Q, ...]; truncated soft-argmax decoding."""
    query_feats = query_feats.astype(jnp.float32)
    position = self.coordinate_head(query_feats)  # [..., 512]
    visible_logits = self.visible_head(query_feats)

    coord_0, coord_1 = jnp.split(position, 2, axis=-1)

    def decode(logits):
      bins = logits.shape[-1]
      idx = jnp.arange(bins, dtype=jnp.float32)
      peak = jnp.argmax(logits, axis=-1, keepdims=True)
      mask = (
          jnp.abs(peak - idx) <= self.soft_argmax_threshold
      ).astype(jnp.float32)
      probs = jax.nn.softmax(logits * self.softmax_temperature, axis=-1)
      probs = probs * mask
      probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
      return jnp.sum(probs * idx, axis=-1)[..., None]

    tracks = jnp.concatenate([decode(coord_0), decode(coord_1)], axis=-1)
    tracks = tracks + 0.5
    return tracks, position, visible_logits

  def __call__(
      self,
      video: Array,  # [B, T, H, W, 3] in [-1, 1]
      query_points: Array,  # [B, Q, (hints,) 3] (t, y, x)
      query_padding: Optional[Array] = None,
      return_cache: bool = False,
  ) -> TrackerResults:
    """Offline forward with per-layer intermediate predictions."""
    _, query_feats, out = self.backbone(
        video, query_points, query_padding
    )
    q = query_feats.shape[2]

    def to_results(feats):
      tracks, logits, vis = self.prediction_heads(feats)
      return (
          tracks.transpose(0, 2, 1, 3),
          logits.transpose(0, 2, 1, 3),
          vis.transpose(0, 2, 1, 3),
      )

    inter_tracks, inter_logits, inter_vis = [], [], []
    b, t = video.shape[:2]
    for lyr in range(self.config.depth):
      feats = out[f"block{lyr:02d}"]["vit_block_intermediates"]["+mlp"]
      feats = feats[:, -q:].reshape(b, t, q, feats.shape[-1])
      tr, lg, vi = to_results(feats)
      inter_tracks.append(tr)
      inter_logits.append(lg)
      inter_vis.append(vi)

    tracks, logits, vis = to_results(query_feats)
    return TrackerResults(
        tracks=tracks,
        track_logits=logits,
        visible_logits=vis,
        intermediate_tracks=inter_tracks,
        intermediate_track_logits=inter_logits,
        intermediate_visible_logits=inter_vis,
        state=out.get("ssm_block_cache") if return_cache else None,
    )

  def forward_step(
      self,
      frames: Array,  # [B, T, H, W, 3]
      query_points: Optional[Array] = None,
      query_padding: Optional[Array] = None,
      state: Optional[ssm_vit.TAPNextTrackingState] = None,
  ) -> TrackerResults:
    """Online rollout: first call with query_points (warm-up over the first
    chunk), subsequent calls with the returned state only."""
    if state is None and query_points is None:
      raise ValueError("state and query_points cannot both be None.")

    if query_points is not None:
      results = self(
          frames, query_points, query_padding, return_cache=True
      )
      return results.replace(
          state=ssm_vit.TAPNextTrackingState(
              step=frames.shape[1],
              query_points=query_points,
              query_padding=(
                  query_padding
                  if query_padding is not None
                  else jnp.ones(query_points.shape[:-1], bool)
              ),
              hidden_state=results.state,
          )
      )

    query_feats, new_state = self.backbone.forward_step(frames, state)
    tracks, logits, vis = (
        self.prediction_heads(query_feats)
    )
    return TrackerResults(
        tracks=tracks.transpose(0, 2, 1, 3),
        track_logits=logits.transpose(0, 2, 1, 3),
        visible_logits=vis.transpose(0, 2, 1, 3),
        intermediate_tracks=[],
        intermediate_track_logits=[],
        intermediate_visible_logits=[],
        state=new_state,
    )


def tracker_certainty(
    tracks: Array, track_logits: Array, radius: int = 8
) -> Array:
  """Probability mass of the coordinate softmax within `radius` bins of the
  prediction — a confidence score (reference: tapnext_torch_utils.py:38-57).

  Args:
    tracks: [..., 2] decoded (y, x) positions.
    track_logits: [..., 512] raw coordinate logits.
    radius: bins.

  Returns:
    [..., 1] certainty in [0, 1].
  """
  coord_0, coord_1 = jnp.split(track_logits, 2, axis=-1)
  probs_0 = jax.nn.softmax(coord_0, axis=-1)
  probs_1 = jax.nn.softmax(coord_1, axis=-1)
  bins = coord_0.shape[-1]
  idx = jnp.arange(bins, dtype=jnp.float32)
  in_r0 = jnp.abs(idx - tracks[..., 0:1]) <= radius
  in_r1 = jnp.abs(idx - tracks[..., 1:2]) <= radius
  c0 = jnp.sum(probs_0 * in_r0, axis=-1)
  c1 = jnp.sum(probs_1 * in_r1, axis=-1)
  return (c0 * c1)[..., None]
