"""TRAJAN: point-trajectory autoencoder (Flax).

Behavioral parity: tapnet/trajan/track_autoencoder.py. Support tracks are
embedded with sinusoidal features, summarized per-track by a small
transformer with visibility-masked mean pooling, cross-attended into 128
latent tokens (dim 64, straight-through quantized), and decoded per query
point by a cross-attention readout emitting 150 frames of (x, y) +
visible/certain logits.

Conventions: tracks are normalized (x, y) in [0, 1]; query points are
(t, x, y); outputs are (x, y).

TPU notes: the decoder is independent per query — `decoder_chunk_size` runs
it as an `nn.scan` over query chunks to bound memory (replacing the
reference's same trick), and the time-feature append is a vmapped
dynamic-slice instead of an einsum against banded identity matrices.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from tapnet_tpu.trajan import attention

Array = jnp.ndarray


class SinusoidalEmbedding(nn.Module):
  """Fourier features: sin then cos, concatenated per coordinate."""

  num_frequencies: int

  @nn.compact
  def __call__(self, inputs: Array) -> Array:
    scales = jnp.asarray(
        [2 ** (i / 3) for i in range(self.num_frequencies)]
    )
    x = jnp.einsum("...,b->...b", inputs, scales)
    out = jnp.sin(jnp.concatenate([x, x + 0.5 * jnp.pi], axis=-1))
    return out.reshape(out.shape[:-2] + (-1,))


class ParamStateInit(nn.Module):
  """Learnable token bank broadcast over the batch."""

  shape: tuple

  @nn.compact
  def __call__(self, batch_shape) -> Array:
    param = self.param(
        "state_init", nn.initializers.normal(stddev=1.0), self.shape
    )
    return jnp.broadcast_to(param, tuple(batch_shape) + param.shape)


@flax.struct.dataclass
class TrackAutoEncoderResults:
  tracks: Array  # [*B, Q, T, 2]
  visible_logits: Array  # [*B, Q, T, 1]
  certain_logits: Array  # [*B, Q, T, 1]

  @property
  def visible(self) -> Array:
    return (self.visible_logits > 0).astype(jnp.float32)

  @property
  def certain(self) -> Array:
    return (self.certain_logits > 0).astype(jnp.float32)

  @property
  def visible_and_certain(self) -> Array:
    return (
        jax.nn.sigmoid(self.visible_logits)
        * jax.nn.sigmoid(self.certain_logits)
        > 0.5
    ).astype(jnp.float32)


@flax.struct.dataclass
class DecoderContext:
  decoder_query: Array  # [*B, Q, features]
  query_frame: Array  # [*B, Q]
  boundary_frame: Optional[Array]  # [*B]


class TrackAutoEncoder(nn.Module):
  """Trajectory autoencoder. Inputs dict:
  support_tracks [B, Q, T, 2], support_tracks_visible [B, Q, T, 1],
  boundary_frame [B] (first padded frame), optional query_points [B, Q', 3]
  as (t, x, y)."""

  num_output_frames: int = 150
  num_latent_tokens: int = 128
  latent_token_dim: int = 64
  num_frequencies: int = 32
  track_scale_factor: float = 1.0
  time_scale_factor: float = 150.0
  track_token_dim: int = 256
  encoder_latent_dim: int = 512
  decoder_num_channels: int = 1024
  decoder_chunk_size: Optional[int] = None
  time_feat_dim: int = 128

  def setup(self):
    self.initializer = ParamStateInit(
        shape=(self.num_latent_tokens, self.encoder_latent_dim)
    )
    self.track_token_projection = nn.Dense(self.track_token_dim)
    self.sinusoidal_embedding = SinusoidalEmbedding(
        num_frequencies=self.num_frequencies
    )
    self.compressor = nn.Dense(self.latent_token_dim)
    self.decompressor = nn.Dense(
        self.decoder_num_channels - self.time_feat_dim
    )
    self.input_track_transformer = attention.ImprovedTransformer(
        qkv_size=512, num_heads=8, mlp_size=1024, num_layers=2
    )
    self.tracks_to_latents = attention.ImprovedTransformer(
        qkv_size=512, num_heads=8, mlp_size=2048, num_layers=6
    )
    self.decompress_attn = attention.ImprovedTransformer(
        qkv_size=512, num_heads=8, mlp_size=2048, num_layers=3
    )
    self.track_readout_attn = attention.ImprovedTransformer(
        qkv_size=512, num_heads=8, mlp_size=1024, num_layers=4
    )
    self.query_encoder = nn.Dense(self.decoder_num_channels)
    self.track_predictor = nn.Dense(self.num_output_frames * 4)

  # ------------------------------------------------------------------ encode

  def embed_track_pos_visible(self, tracks: Array, visible: Array) -> Array:
    """Sinusoidal embedding of (x, y, t/T) per track sample."""
    t = tracks.shape[-2]
    fr = jnp.broadcast_to(
        (jnp.arange(t) / t)[None, None, :, None], visible.shape
    )
    feats = jnp.concatenate([tracks, fr], axis=-1)
    return self.sinusoidal_embedding(feats / self.track_scale_factor)

  def encode_tracks(
      self, tracks: Array, visible: Array, restart: Array
  ) -> Array:
    """Per-track descriptor: transformer over time with visibility +
    boundary masking, then visibility-weighted mean pooling."""
    tokens = self.track_token_projection(
        self.embed_track_pos_visible(tracks, visible)
    )
    time = jnp.arange(visible.shape[2])
    in_bounds = time < restart[..., None, None, None]  # [B, 1, 1, T]
    vis = visible[..., 0].astype(bool)
    key_mask = jnp.ones_like(vis[..., None]) * vis[..., None, :]
    tokens = self.input_track_transformer(
        tokens, qq_mask=in_bounds * key_mask
    )
    weights = vis[..., None].astype(tokens.dtype)
    return (tokens * weights).sum(-2) / jnp.maximum(1.0, weights.sum(-2))

  def encode(self, inputs: Mapping[str, Any]) -> Array:
    """Support tracks -> [B, num_latent_tokens, latent_token_dim]."""
    track_tokens = self.encode_tracks(
        inputs["support_tracks"],
        inputs["support_tracks_visible"],
        inputs["boundary_frame"],
    )
    latents = self.initializer((inputs["support_tracks"].shape[0],))
    latents = self.tracks_to_latents(latents, track_tokens)
    return self.compressor(latents)

  # ------------------------------------------------------------------ decode

  def get_decoder_context(self, inputs: Mapping[str, Any]) -> DecoderContext:
    if "query_points" in inputs:
      decoder_query = inputs["query_points"][..., 1:]
      query_frame = jnp.round(inputs["query_points"][..., 0]).astype(
          jnp.int32
      )
    else:
      # Default: 32x32 grid of cell centers at t=0.
      centers = jnp.arange(32) / 32.0 + 1.0 / 64.0
      gx, gy = jnp.meshgrid(centers, centers)
      decoder_query = jnp.stack([gx, gy], -1).reshape(-1, 2)
      decoder_query = jnp.broadcast_to(
          decoder_query,
          inputs["support_tracks"].shape[:-3] + decoder_query.shape,
      )
      query_frame = jnp.zeros(decoder_query.shape[:-1], jnp.int32)
    decoder_query = self.sinusoidal_embedding(
        decoder_query / self.track_scale_factor
    )
    return DecoderContext(
        decoder_query=decoder_query,
        query_frame=query_frame,
        boundary_frame=inputs.get("boundary_frame"),
    )

  def _append_time_feat(self, latents: Array, query_frame: Array) -> Array:
    """Appends a 128-dim window of each latent starting at 5*query_frame —
    a cheap time-conditioning channel shuffle (dynamic slice; equivalent to
    the reference's banded-identity einsum, tapir reference
    track_autoencoder.py:290-304)."""

    def slice_one(lat, idx):
      return jax.lax.dynamic_slice_in_dim(
          lat, idx * 5, self.time_feat_dim, axis=-1
      )

    # latents [*B, Q, N, C]; query_frame [*B, Q].
    fn = slice_one
    for _ in range(query_frame.ndim):
      fn = jax.vmap(fn)
    return jnp.concatenate([latents, fn(latents, query_frame)], axis=-1)

  def decode(
      self,
      latents: Array,
      decoder_context: DecoderContext,
      discretize: bool = True,
      rng: Optional[Array] = None,
  ) -> TrackAutoEncoderResults:
    """Latents + query context -> per-query tracks over num_output_frames."""
    latents = jnp.clip(latents, -1.0, 1.0)
    if discretize:
      # Straight-through quantization to 1/128 steps with dither.
      quant = jnp.round(latents * 128.0) / 128.0
      rng = rng if rng is not None else jax.random.PRNGKey(0)
      quant = quant + jax.random.uniform(rng, quant.shape) / 128.0 - (
          1.0 / 256.0
      )
      latents = latents - jax.lax.stop_gradient(latents - quant)

    latents = self.decompressor(latents)
    latents = self.decompress_attn(latents)

    queries = jnp.concatenate(
        [
            decoder_context.decoder_query,
            decoder_context.query_frame[..., None]
            // self.time_scale_factor,
        ],
        axis=-1,
    )
    query_tokens = self.query_encoder(
        self.sinusoidal_embedding(queries / self.track_scale_factor)
    )  # [*B, Q, C]

    num_queries = query_tokens.shape[-2]
    tiled = jnp.broadcast_to(
        latents[..., None, :, :],
        latents.shape[:-2] + (num_queries,) + latents.shape[-2:],
    )
    tiled = self._append_time_feat(tiled, decoder_context.query_frame)
    tokens = jnp.concatenate([query_tokens[..., None, :], tiled], axis=-2)
    out = self.track_readout_attn(tokens)[..., 0, :]
    out = self.track_predictor(out)

    t = self.num_output_frames
    tracks = jnp.stack([out[..., :t], out[..., t : 2 * t]], axis=-1)
    return TrackAutoEncoderResults(
        tracks=tracks,
        visible_logits=out[..., 2 * t : 3 * t, None],
        certain_logits=out[..., 3 * t :, None],
    )

  def __call__(self, inputs: Mapping[str, Any]) -> TrackAutoEncoderResults:
    latents = self.encode(inputs)
    if self.decoder_chunk_size is None:
      return self.decode(latents, self.get_decoder_context(inputs))

    # Chunked decoding: scan over query chunks with broadcast params.
    def scan_fn(mdl, carry, qp_chunk):
      ctx = mdl.get_decoder_context(
          dict(
              query_points=qp_chunk + carry,
              boundary_frame=inputs["boundary_frame"],
          )
      )
      res = mdl.decode(latents, ctx)
      return jnp.sum(res.tracks) > 1e20, res

    h = self.decoder_chunk_size
    qp = inputs["query_points"]
    chunked = qp.reshape(qp.shape[:-2] + (-1, h, qp.shape[-1]))
    scanned = nn.scan(
        scan_fn,
        variable_broadcast="params",
        split_rngs={"params": False},
        in_axes=-3,
        out_axes=-4,
    )
    _, res = scanned(self, jnp.asarray(False), chunked)
    merge = lambda x: x.reshape(
        x.shape[:-4] + (-1,) + x.shape[-2:]
    )
    return TrackAutoEncoderResults(
        tracks=merge(res.tracks),
        visible_logits=merge(res.visible_logits),
        certain_logits=merge(res.certain_logits),
    )
