"""Minimal torchvision.models.vision_transformer stub for parity tests.

The reference torch TAPNext (/root/reference/tapnet/tapnext/tapnext_torch.py:28)
imports `vision_transformer.EncoderBlock` from torchvision, which is not
installed in this environment. This stub reproduces torchvision's
EncoderBlock exactly — pre-LN (eps 1e-6) multi-head self-attention and an
MLP whose Sequential indices match torchvision's MLPBlock (Linear at 0 and
3), because the reference checkpoint converter
(tapnext_torch_utils.py:104-143) addresses parameters by those names
(`ln_1.weight`, `self_attention.in_proj_weight`, `mlp.0.weight`, ...).

Test-only code: install_stub() registers the stub under
`torchvision.models.vision_transformer` in sys.modules so the reference
module imports unmodified.
"""

import functools
import sys
import types

import torch
from torch import nn


class MLPBlock(nn.Sequential):
  """torchvision.ops.misc.MLP with [mlp_dim, in_dim] hidden layout:
  Linear -> GELU -> Dropout -> Linear -> Dropout."""

  def __init__(self, in_dim: int, mlp_dim: int, dropout: float):
    super().__init__(
        nn.Linear(in_dim, mlp_dim),
        nn.GELU(),
        nn.Dropout(dropout),
        nn.Linear(mlp_dim, in_dim),
        nn.Dropout(dropout),
    )


class EncoderBlock(nn.Module):
  """torchvision.models.vision_transformer.EncoderBlock."""

  def __init__(
      self,
      num_heads: int,
      hidden_dim: int,
      mlp_dim: int,
      dropout: float,
      attention_dropout: float,
      norm_layer=functools.partial(nn.LayerNorm, eps=1e-6),
  ):
    super().__init__()
    self.num_heads = num_heads
    self.ln_1 = norm_layer(hidden_dim)
    self.self_attention = nn.MultiheadAttention(
        hidden_dim, num_heads, dropout=attention_dropout, batch_first=True
    )
    self.dropout = nn.Dropout(dropout)
    self.ln_2 = norm_layer(hidden_dim)
    self.mlp = MLPBlock(hidden_dim, mlp_dim, dropout)

  def forward(self, input):  # pylint: disable=redefined-builtin
    torch._assert(
        input.dim() == 3,
        f"Expected (batch, seq, hidden) got {input.shape}",
    )
    x = self.ln_1(input)
    x, _ = self.self_attention(x, x, x, need_weights=False)
    x = self.dropout(x)
    x = x + input
    y = self.ln_2(x)
    y = self.mlp(y)
    return x + y


def install_stub():
  """Registers this module as torchvision.models.vision_transformer."""
  if "torchvision" in sys.modules:
    return
  vt = types.ModuleType("torchvision.models.vision_transformer")
  vt.EncoderBlock = EncoderBlock
  vt.MLPBlock = MLPBlock
  models = types.ModuleType("torchvision.models")
  models.vision_transformer = vt
  tv = types.ModuleType("torchvision")
  tv.models = models
  sys.modules["torchvision"] = tv
  sys.modules["torchvision.models"] = models
  sys.modules["torchvision.models.vision_transformer"] = vt
