"""ViT-SSM backbone for TAPNext (TRecViT-style), Flax.

Behavioral parity: tapnet/models/ssm_vit.py. Each layer runs a Griffin
recurrent block over time (per token tube) followed by a ViT attention block
over space (per frame). Queries are extra tokens scattered over time as
[XY]/[U]/[M] tokens (see `embed_queries_and_hints`).

TPU-first details:
  * The temporal recurrence is our own Griffin block
    (tapnet_tpu.models.rglru) with a parallel associative scan, replacing the
    recurrentgemma dependency; streaming uses a typed RecurrentBlockCache.
  * The query/hint scatter is vectorized (broadcast compares + where) rather
    than per-hint scatter ops, which XLA fuses and the TPU backend handles
    without scatter kernels.
  * Param names match released TAPNext checkpoints
    (backbone/Transformer/encoderblock_{i}/{ssm_block,vit_block}/...).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import rglru
from tapnet_tpu.utils import sampling

Array = jnp.ndarray


def posemb_sincos_2d(
    h: int, w: int, width: int, temperature: float = 10_000.0,
    dtype=jnp.float32,
) -> Array:
  """MoCo-v3-style fixed 2D sin/cos position embedding: [1, h*w, width]."""
  if width % 4 != 0:
    raise ValueError("Width must be a multiple of 4 for sincos posemb.")
  y, x = jnp.mgrid[:h, :w]
  omega = jnp.arange(width // 4) / (width // 4 - 1)
  omega = 1.0 / (temperature**omega)
  y = jnp.einsum("m,d->md", y.flatten(), omega)
  x = jnp.einsum("m,d->md", x.flatten(), omega)
  pe = jnp.concatenate(
      [jnp.sin(x), jnp.cos(x), jnp.sin(y), jnp.cos(y)], axis=1
  )
  return pe.astype(dtype)[None]


class MlpBlock(nn.Module):
  """Standard transformer MLP (4x expansion)."""

  mlp_dim: Optional[int] = None
  dtype_mm: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    d = x.shape[-1]
    inits = dict(
        kernel_init=nn.initializers.xavier_uniform(),
        bias_init=nn.initializers.normal(stddev=1e-6),
    )
    x = nn.Dense(self.mlp_dim or 4 * d, dtype=self.dtype_mm, **inits)(x)
    x = jax.nn.gelu(x)
    return nn.Dense(d, dtype=self.dtype_mm, **inits)(x)


class ViTBlock(nn.Module):
  """Pre-norm MHSA + MLP block over the token axis."""

  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dtype_mm: Any = jnp.float32
  mask_image2image: bool = False
  mask_query2image: bool = False
  num_image_tokens: int = 1024

  @nn.compact
  def __call__(self, x: Array) -> Tuple[Array, Dict[str, Array]]:
    out = {}
    y = nn.LayerNorm()(x)
    mask = None
    if self.mask_image2image or self.mask_query2image:
      n = x.shape[1]
      m = jnp.ones((n, n), bool)
      ni = self.num_image_tokens
      if self.mask_image2image:
        m = m.at[:ni, :ni].set(False)
      if self.mask_query2image:
        m = m.at[:ni, ni:].set(False)
      mask = m[None, None]
    y = nn.MultiHeadDotProductAttention(
        num_heads=self.num_heads,
        kernel_init=nn.initializers.xavier_uniform(),
        deterministic=True,
        dtype=self.dtype_mm,
    )(y, y, mask=mask)
    x = x + y
    y = nn.LayerNorm()(x)
    y = MlpBlock(mlp_dim=self.mlp_dim, dtype_mm=self.dtype_mm)(y)
    x = out["+mlp"] = x + y
    return x, out


class ViTSSMBlock(nn.Module):
  """Griffin recurrence over time, then ViT attention over tokens."""

  depth: int
  width: int
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dtype_mm: Any = jnp.float32
  lru_width: Optional[int] = None
  bidirectional_ssm: bool = False
  mask_image2image: bool = False
  mask_query2image: bool = False
  num_image_tokens: int = 1024
  # Optional (Mesh, time_axis): run the SSM temporal scan and causal conv
  # time-sharded over the mesh (parallel/sequence.py).
  sp: Optional[Tuple] = None

  @nn.compact
  def __call__(
      self,
      x: Array,  # [b*t, n, c]
      cache: Optional[rglru.RecurrentBlockCache],
      batch: int,
  ):
    bt, n, c = x.shape
    b = batch
    t = bt // b
    outs = {}

    ssm_block = rglru.GriffinResidualBlock(
        name="ssm_block",
        mlp_expanded_width=self.mlp_dim or 4 * self.width,
        num_heads=self.num_heads,
        lru_width=self.lru_width,
        final_w_init_variance_scale=2.0 / self.depth,
        sp=self.sp,
    )

    # [b*t, n, c] -> [b*n, t, c]: tubes along batch, time as sequence.
    h = x.reshape(b, t, n, c).transpose(0, 2, 1, 3).reshape(b * n, t, c)
    if self.bidirectional_ssm:
      h2 = jnp.concatenate([h, jnp.flip(h, axis=1)], axis=-1)
      h2, _ = ssm_block(h2, None)
      fwd, bwd = jnp.split(h2, 2, axis=-1)
      h = fwd + jnp.flip(bwd, axis=1)
      outs["ssm_block_cache"] = None
    else:
      h, outs["ssm_block_cache"] = ssm_block(h, cache)
    x = h.reshape(b, n, t, c).transpose(0, 2, 1, 3).reshape(bt, n, c)

    x, vit_out = ViTBlock(
        name="vit_block",
        num_heads=self.num_heads,
        mlp_dim=self.mlp_dim,
        dtype_mm=self.dtype_mm,
        mask_image2image=self.mask_image2image,
        mask_query2image=self.mask_query2image,
        num_image_tokens=self.num_image_tokens,
    )(x)
    outs["vit_block_intermediates"] = vit_out
    return x, outs


class ViTSSMBackbone(nn.Module):
  """Stack of ViTSSM blocks + final LayerNorm ("Transformer" scope)."""

  depth: int
  width: int
  num_heads: int = 12
  mlp_dim: Optional[int] = None
  dtype_mm: Any = jnp.float32
  lru_width: Optional[int] = None
  bidirectional_ssm: bool = False
  mask_image2image: bool = False
  mask_query2image: bool = False
  num_image_tokens: int = 1024
  remat: bool = False
  sp: Optional[Tuple] = None  # see ViTSSMBlock.sp

  @nn.compact
  def __call__(
      self,
      x: Array,  # [b, t, n, c]
      cache: Optional[rglru.RecurrentBlockCache] = None,
  ):
    out: Dict[str, Any] = {}
    b, t, n, c = x.shape
    x = x.reshape(b * t, n, c)

    block_cls = ViTSSMBlock
    if self.remat:
      block_cls = nn.remat(ViTSSMBlock, static_argnums=(3,))

    layer_caches = []
    for lyr in range(self.depth):
      current_cache = (
          jax.tree_util.tree_map(lambda o, l=lyr: o[l], cache)
          if cache is not None
          else None
      )
      x, outs = block_cls(
          name=f"encoderblock_{lyr}",
          depth=self.depth,
          width=self.width,
          num_heads=self.num_heads,
          mlp_dim=self.mlp_dim,
          dtype_mm=self.dtype_mm,
          lru_width=self.lru_width,
          bidirectional_ssm=self.bidirectional_ssm,
          mask_image2image=self.mask_image2image,
          mask_query2image=self.mask_query2image,
          num_image_tokens=self.num_image_tokens,
          sp=self.sp,
      )(x, current_cache, b)
      out[f"block{lyr:02d}"] = outs
      layer_caches.append(outs["ssm_block_cache"])

    if layer_caches[0] is not None:
      out["ssm_block_cache"] = jax.tree_util.tree_map(
          lambda *leaves: jnp.stack(leaves, axis=0), *layer_caches
      )
    out["pre_ln"] = x
    return nn.LayerNorm(name="encoder_norm", dtype=self.dtype_mm)(x), out


@flax.struct.dataclass
class TAPNextTrackingState:
  """Typed streaming state for online TAPNext."""

  step: int
  query_points: Array  # [B, Q, (hints,) 3] (t, y, x)
  query_padding: Array  # [B, Q, (hints)]
  hidden_state: Optional[rglru.RecurrentBlockCache] = None  # stacked [L, ...]


@dataclasses.dataclass(frozen=True)
class SsmVitConfig:
  """Architecture config (ViT variant table: reference ssm_vit.py:785-858)."""

  width: int = 768
  depth: int = 12
  mlp_dim: int = 3072
  num_heads: int = 12
  patch_size: Tuple[int, int, int] = (1, 8, 8)
  image_size: Tuple[int, int] = (256, 256)
  lru_width: Optional[int] = None
  posemb: str = "learn"
  posemb_full: str = "learn"
  bidirectional_ssm: bool = False
  query_scale: int = 1
  mask_image2image: bool = False
  mask_query2image: bool = False
  # "bfloat16" runs attention and MLP matmuls in bf16 (params stay fp32;
  # the RG-LRU recurrence, norms, and heads stay fp32).
  compute_dtype: str = "float32"
  # Rematerialize each ViTSSM block on backward (layer inputs stored, layer
  # internals recomputed). Required for long-clip training: without it even
  # a time-chunked backward holds every layer's chunk activations at once.
  remat: bool = False
  # Sequence parallelism: a jax.sharding.Mesh whose `sp_axis` axis shards
  # the video TIME dimension. The SSM temporal scan and causal conv — the
  # only cross-time ops — run via parallel/sequence.py (local fused scans
  # + O(P*B*C) carry exchange); everything else is per-frame and GSPMD
  # shards it along the same axis. This replaces the reference's
  # sharding-spec hook (tapnet/utils/ssm_utils.py:51-64) with a real
  # cross-device algorithm.
  sp_mesh: Optional[Any] = None
  sp_axis: str = "data"

  @property
  def dtype_mm(self):
    return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


VARIANTS = {
    "mu": dict(width=32, depth=1, mlp_dim=128, num_heads=2),
    "Ti": dict(width=192, depth=12, mlp_dim=768, num_heads=3),
    "S": dict(width=384, depth=12, mlp_dim=1536, num_heads=6),
    "M": dict(width=512, depth=12, mlp_dim=2048, num_heads=8),
    "B": dict(width=768, depth=12, mlp_dim=3072, num_heads=12),
    "L": dict(width=1024, depth=24, mlp_dim=4096, num_heads=16),
    "H": dict(width=1280, depth=32, mlp_dim=5120, num_heads=16),
}


def variant_config(variant: str, **overrides) -> SsmVitConfig:
  kwargs = dict(VARIANTS[variant])
  kwargs.update(overrides)
  return SsmVitConfig(**kwargs)


class TokenSubsampling(nn.Module):
  """Random temporal-suffix masking of video tokens ("drops video tubes").

  Training-time degradation for TAPNext (reference utils/ssm_utils.py:
  67-142): per batch element, a cutoff s ~ Uniform{1..T-1} is drawn and all
  video tokens at frames t >= s are replaced by the mask token, so the
  model learns to keep tracking from memory when observations stop. The
  reference builds this from generic scatter helpers; here it is one
  jnp.where over a time iota.

  Returns (masked_tokens, masked_positions [B, T] bool, True = masked).
  """

  drop_ratio: float
  drop_ratio_test: float = 0.0
  is_training: bool = False

  @nn.compact
  def __call__(
      self,
      tokens: Array,  # [B, T, N, D]
      mask_token: Array,  # broadcastable to [B, T, N, D]
      override_drop_ratio: Optional[float] = None,
  ) -> Tuple[Array, Array]:
    b, t = tokens.shape[:2]
    if override_drop_ratio is not None:
      drop_ratio = override_drop_ratio
    elif self.is_training:
      drop_ratio = self.drop_ratio
    else:
      drop_ratio = self.drop_ratio_test
    if drop_ratio == 0.0:
      return tokens, jnp.zeros((b, t), jnp.bool_)

    rng = self.make_rng("degradation")
    cutoff = jax.random.randint(rng, (b,), 1, t)  # s in [1, T-1]
    t_idx = jnp.arange(t)[None]  # [1, T]
    masked = t_idx >= cutoff[:, None]  # [B, T]
    mask_token = jnp.broadcast_to(mask_token, tokens.shape)
    tokens = jnp.where(masked[:, :, None, None], mask_token, tokens)
    return tokens, masked


class _PatchEmbed(nn.Module):
  """Patch embedding as reshape + matmul.

  Mathematically the non-overlapping patch conv (stride == kernel), with
  an identical parameter tree to `nn.Conv` (kernel [1, ph, pw, 3, width],
  bias [width]) so checkpoints are interchangeable. The matmul form
  matters on TPU: a conv whose input has 3 minor-dim channels makes XLA
  materialize a layout copy of the whole video padded from 3 to 128
  lanes — a 42x blowup that OOMs HBM at 1024 frames. Patchifying by
  reshape first gives a [..., ph*pw*3] tensor with benign padding and
  puts the contraction (192+) on the MXU.
  """

  width: int
  patch_size: Tuple[int, int, int]

  @nn.compact
  def __call__(self, video: Array) -> Array:
    pt, ph, pw = self.patch_size
    if pt != 1:
      raise NotImplementedError(
          "temporal patching (patch_size[0] != 1) is not supported; got "
          f"patch_size={self.patch_size}"
      )
    b, t, h, w, cin = video.shape
    kernel = self.param(
        "kernel",
        nn.initializers.lecun_normal(),
        (1, ph, pw, cin, self.width),
    )
    bias = self.param("bias", nn.initializers.zeros, (self.width,))
    x = video.reshape(b, t, h // ph, ph, w // pw, pw, cin)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
        b, t, h // ph, w // pw, ph * pw * cin
    )
    return (
        jnp.dot(x, kernel.reshape(ph * pw * cin, self.width)) + bias
    )


class MaskedSequenceDecoder(nn.Module):
  """TAPNext backbone: patch embed + query tokens + ViT-SSM encoder."""

  config: SsmVitConfig = SsmVitConfig()

  def setup(self):
    cfg = self.config
    self.lin_proj = _PatchEmbed(
        width=cfg.width,
        patch_size=cfg.patch_size,
        name="embedding",
    )
    h = cfg.image_size[0] // cfg.patch_size[1]
    w = cfg.image_size[1] // cfg.patch_size[2]
    self._grid_hw = (h, w)
    self.encoder = ViTSSMBackbone(
        depth=cfg.depth,
        width=cfg.width,
        num_heads=cfg.num_heads,
        mlp_dim=cfg.mlp_dim,
        dtype_mm=cfg.dtype_mm,
        lru_width=cfg.lru_width,
        bidirectional_ssm=cfg.bidirectional_ssm,
        mask_image2image=cfg.mask_image2image,
        mask_query2image=cfg.mask_query2image,
        num_image_tokens=h * w,
        remat=cfg.remat,
        sp=(cfg.sp_mesh, cfg.sp_axis) if cfg.sp_mesh is not None else None,
        name="Transformer",
    )
    init = nn.initializers.normal(stddev=1 / np.sqrt(cfg.width))
    self.mask_token = self.param(
        "mask_token", init, (1, 1, 1, cfg.width), jnp.float32
    )
    self.unknown_token = self.param(
        "unknown_token", init, (1, 1, cfg.width), jnp.float32
    )
    self.point_query_token = self.param(
        "point_query_token", init, (1, 1, 1, cfg.width), jnp.float32
    )
    if cfg.posemb == "learn":
      self.image_pos_emb = self.param(
          "pos_embedding", init, (1, h * w, cfg.width), jnp.float32
      )
    if cfg.posemb_full == "learn":
      ph, pw = cfg.image_size
      self.full_pos_emb = self.param(
          "pos_embedding_full",
          init,
          (1, ph * pw * cfg.query_scale**2, cfg.width),
          jnp.float32,
      )

  def _posemb_image(self) -> Array:
    cfg = self.config
    if cfg.posemb == "learn":
      return self.image_pos_emb
    return posemb_sincos_2d(*self._grid_hw, cfg.width)

  def _posemb_full_spatial(self) -> Array:
    cfg = self.config
    ph = cfg.image_size[0] * cfg.query_scale
    pw = cfg.image_size[1] * cfg.query_scale
    if cfg.posemb_full == "learn":
      pe = self.full_pos_emb
    else:
      pe = posemb_sincos_2d(ph, pw, cfg.width)
    return pe.reshape(ph, pw, cfg.width)

  def embed_queries_and_hints(
      self,
      timesteps: int,
      query_points: Array,  # [B, Q, hints, 3] (t, y, x)
      query_padding: Array,  # [B, Q, hints]
  ) -> Array:  # [B, T, Q, c]
    """Builds the query token tensor.

    Each track contributes one token per frame: its [XY] token (query token +
    positional embedding sampled at the query point) on hint frames, [U]
    (unknown) before the first hint, and [M] (mask, i.e. "predict here")
    elsewhere. Reference semantics documented at ssm_vit.py:437-495.
    """
    cfg = self.config
    b, q, hints, _ = query_points.shape
    t = timesteps

    ts = query_points[..., 0].astype(jnp.int32)  # [B, Q, hints]
    positions = query_points[..., 1:]  # (y, x)
    padding = query_padding.astype(bool)

    # [XY] tokens: query token + bilinear sample of the full pos embedding.
    pe_full = self._posemb_full_spatial()
    pos_flat = (positions * cfg.query_scale).reshape(b, q * hints, 2)
    pe_samples = jax.vmap(
        lambda pts: sampling.sample_grid_2d(pe_full, pts, mode="nearest")
    )(pos_flat).reshape(b, q, hints, cfg.width)
    xy_tokens = self.point_query_token + pe_samples  # [B, Q, hints, c]

    t_idx = jnp.arange(t)[None, :, None]  # [1, T, 1]

    tokens = jnp.broadcast_to(
        self.mask_token, (b, t, q, cfg.width)
    )
    # [U] prefix before the first hint.
    prefix = jnp.clip(ts[..., 0], 0, t)  # [B, Q]
    unknown_sel = (t_idx < prefix[:, None, :]) & padding[..., 0][:, None, :]
    tokens = jnp.where(
        unknown_sel[..., None],
        self.unknown_token[:, :, None, :],
        tokens,
    )
    # [XY] scatters, in hint order (later hints override earlier).
    for k in range(hints):
      ts_k = ts[..., k]
      valid = padding[..., k] & (ts_k >= 0) & (ts_k < t)
      ts_c = jnp.clip(ts_k, 0, t - 1)
      sel = (t_idx == ts_c[:, None, :]) & valid[:, None, :]
      tokens = jnp.where(
          sel[..., None], xy_tokens[:, None, :, k, :], tokens
      )
    return tokens

  def _encode(
      self,
      video: Array,
      query_tokens: Array,
      cache: Optional[rglru.RecurrentBlockCache],
  ):
    """Patchify + posemb + concat query tokens + run encoder."""
    x = self.lin_proj(video)
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h * w, c) + self._posemb_image()[:, None]
    x = jnp.concatenate([x, query_tokens], axis=2)
    x, out = self.encoder(x, cache)
    return x.reshape(b, t, -1, c), out, (h, w)

  def __call__(
      self,
      video: Array,  # [B, T, H, W, 3]
      query_points: Array,  # [B, Q, (hints,) 3] (t, y, x)
      query_padding: Optional[Array] = None,
  ):
    """Offline forward. Returns (video_feats [B,T,h,w,c],
    query_feats [B,T,Q,c], out dict with per-layer intermediates)."""
    if query_points.ndim == 3:
      query_points = query_points[..., None, :]
    if query_padding is None:
      query_padding = jnp.ones(query_points.shape[:-1], bool)
    elif query_padding.ndim == 2:
      query_padding = query_padding[..., None]

    q = query_points.shape[1]
    query_tokens = self.embed_queries_and_hints(
        video.shape[1], query_points, query_padding
    )
    x, out, (h, w) = self._encode(video, query_tokens, None)
    video_feats = x[:, :, : h * w].reshape(
        x.shape[0], x.shape[1], h, w, x.shape[-1]
    )
    query_feats = x[:, :, -q:]
    return video_feats, query_feats, out

  def forward_step(
      self,
      video: Array,  # [B, T, H, W, 3] (usually T=1)
      state: TAPNextTrackingState,
  ) -> Tuple[Array, TAPNextTrackingState]:
    """Streaming step: reuses the per-layer recurrent caches."""
    if state.hidden_state is None:
      raise ValueError("state.hidden_state is required for forward_step.")
    query_points = state.query_points
    query_padding = state.query_padding
    if query_points.ndim == 3:
      query_points = query_points[..., None, :]
    if query_padding is not None and query_padding.ndim == 2:
      query_padding = query_padding[..., None]
    if query_padding is None:
      query_padding = jnp.ones(query_points.shape[:-1], bool)

    # Shift query timesteps into this chunk's local frame.
    query_points = jnp.concatenate(
        [query_points[..., :1] - state.step, query_points[..., 1:]],
        axis=-1,
    )
    q = query_points.shape[1]
    t = video.shape[1]
    query_tokens = self.embed_queries_and_hints(
        t, query_points, query_padding
    )
    x, out, _ = self._encode(video, query_tokens, state.hidden_state)
    query_feats = x[:, :, -q:]
    new_state = TAPNextTrackingState(
        step=state.step + t,
        query_points=state.query_points,
        query_padding=state.query_padding,
        hidden_state=out["ssm_block_cache"],
    )
    return query_feats, new_state
