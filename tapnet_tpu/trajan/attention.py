"""ViT-22B-style transformer used by TRAJAN (Flax).

Behavioral parity: tapnet/trajan/attention.py — LayerNorm'd (scale-only)
pre-norm, RMSNorm on per-head queries/keys, parallel self + cross attention
into a shared residual, then an MLP. Param names match the reference so
released TRAJAN checkpoints import by renaming alone.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class ImprovedMHDPAttention(nn.Module):
  """Multi-head attention with RMS-normalized queries and keys."""

  num_heads: int
  qk_size: int
  v_size: Optional[int] = None

  @nn.compact
  def __call__(
      self,
      inputs_q: Array,
      inputs_kv: Array,
      mask: Optional[Array] = None,
  ) -> Array:
    v_size = self.v_size or self.qk_size
    if self.qk_size % self.num_heads or v_size % self.num_heads:
      raise ValueError("qk/v sizes must divide num_heads.")
    head_qk = self.qk_size // self.num_heads
    head_v = v_size // self.num_heads

    query = nn.DenseGeneral(
        (self.num_heads, head_qk), use_bias=False, name="dense_query"
    )(inputs_q)
    key = nn.DenseGeneral(
        (self.num_heads, head_qk), use_bias=False, name="dense_key"
    )(inputs_kv)
    query = nn.RMSNorm(name="norm_query")(query)
    key = nn.RMSNorm(name="norm_key")(key)
    value = nn.DenseGeneral(
        (self.num_heads, head_v), use_bias=False, name="dense_value"
    )(inputs_kv)

    x = nn.dot_product_attention(query, key, value, mask=mask)
    return nn.DenseGeneral(
        inputs_q.shape[-1], axis=(-2, -1), use_bias=True, name="dense_out"
    )(x)


class ImprovedTransformerBlock(nn.Module):
  """One block: parallel self(+cross) attention into the residual, then MLP."""

  mlp_size: int
  num_heads: int
  qkv_size: int

  @nn.compact
  def __call__(
      self,
      queries: Array,
      inputs_kv: Optional[Array] = None,
      qq_mask: Optional[Array] = None,
      qk_mask: Optional[Array] = None,
  ) -> Array:
    width = queries.shape[-1]
    normed = nn.LayerNorm(use_bias=False, name="norm_q")(queries)

    out = queries + ImprovedMHDPAttention(
        num_heads=self.num_heads, qk_size=self.qkv_size, name="self_att"
    )(
        normed,
        normed,
        mask=None if qq_mask is None else qq_mask.astype(jnp.float32),
    )
    if inputs_kv is not None:
      out = out + ImprovedMHDPAttention(
          num_heads=self.num_heads, qk_size=self.qkv_size, name="cross_att"
      )(
          normed,
          inputs_kv,
          mask=None if qk_mask is None else qk_mask.astype(jnp.float32),
      )

    normed_out = nn.LayerNorm(use_bias=False, name="norm_attn")(out)
    h = nn.gelu(nn.Dense(self.mlp_size, name="MLP_in")(normed_out))
    return out + nn.Dense(width, name="MLP_out")(h)


class ImprovedTransformer(nn.Module):
  """Stack of blocks + final scale-only LayerNorm."""

  qkv_size: int
  num_heads: int
  mlp_size: int
  num_layers: int

  @nn.compact
  def __call__(
      self,
      queries: Array,
      inputs_kv: Optional[Array] = None,
      qq_mask: Optional[Array] = None,
      qk_mask: Optional[Array] = None,
  ) -> Array:
    if qk_mask is not None and qk_mask.ndim == inputs_kv.ndim:
      qk_mask = qk_mask[..., None, :, :]
    if qq_mask is not None and qq_mask.ndim == queries.ndim:
      qq_mask = qq_mask[..., None, :, :]
    for i in range(self.num_layers):
      queries = ImprovedTransformerBlock(
          qkv_size=self.qkv_size,
          num_heads=self.num_heads,
          mlp_size=self.mlp_size,
          name=f"layer_{i}",
      )(queries, inputs_kv=inputs_kv, qq_mask=qq_mask, qk_mask=qk_mask)
    return nn.LayerNorm(use_bias=False, name="norm_encoder")(queries)
