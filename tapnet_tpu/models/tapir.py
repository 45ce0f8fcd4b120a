"""TAPIR: two-stage point tracker, TPU-native implementation (Flax).

Behavioral parity target: tapnet/models/tapir_model.py (reference), i.e.
stage 1 initializes every query's trajectory from a global cost volume
(per-frame feature matching + soft-argmax), stage 2 iteratively refines
trajectories with local 7x7 correlations over a feature pyramid fed through a
depthwise-conv MLP-Mixer across time.

TPU-first design choices (vs. the reference):
  * The local-correlation patch extraction is two small matmuls against
    separable bilinear-tent weight matrices (MXU work), replacing both the
    reference's per-point gather path and its giant-depthwise-conv trick
    (tapir_model.py:509-562). The three paths are numerically identical; the
    gather path is kept for CPU/testing.
  * Online/streaming state is a typed pytree of stacked arrays
    (`TapirCausalState`), not dicts keyed by layer-name strings
    (tapir_model.py:1156-1170), so it lives in HBM and jits cleanly.
  * Cost volumes are computed time-major (`tbnhw`) to avoid TPU padding, and
    the feature backbone runs under remat.
  * Query chunking is a clean static loop without the reference's fake
    "barrier" data dependencies.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Mapping, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.models import resnet as resnet_lib
from tapnet_tpu.models.layers import ExtraConvs, MixerCache, PipsMixer
from tapnet_tpu.utils import sampling, transforms

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TapirConfig:
  """Static TAPIR hyperparameters (reference defaults: tapir_model.py:299-332)."""

  num_pips_iter: int = 4
  pyramid_level: int = 1
  patch_size: int = 7
  softmax_temperature: float = 20.0
  mixer_hidden_dim: int = 512
  num_mixer_blocks: int = 12
  mixer_kernel_size: int = 3
  use_causal_conv: bool = False
  initial_resolution: Tuple[int, int] = (256, 256)
  blocks_per_group: Sequence[int] = (2, 2, 2, 2)
  extra_convs: bool = False
  highres_dim: int = 128
  lowres_dim: int = 256
  # True: matmul-based patch correlation (TPU/MXU path). False: gather path.
  use_matmul_corr: bool = True
  # With use_matmul_corr: extract the 7x7 tent patches from the correlation
  # map via two take_along_axis row/column gathers + fractional shift-adds
  # instead of two dense tent-weight matmuls. Numerically identical.
  # Measured on v5e at 1024q x 250f @480p: SLOWER (3.48 s vs 2.54 s whole
  # model) — TPU gathers lose to the tent matmuls even at their ~1% MXU
  # utilization. Kept as an option for gather-friendly backends.
  use_gather_tents: bool = False
  # Fuse the correlation einsum and tent extraction into one Pallas kernel
  # that never materializes the [B, N, T, H, W] correlation volume in HBM
  # (ops/corr_tents.py). Falls back to the einsum path off-TPU and for
  # oversized frames. Only applies to the matmul-corr path.
  use_fused_corr: bool = True
  feature_extractor_chunk_size: Optional[int] = None
  parallelize_query_extraction: bool = False
  # "bfloat16" runs the backbone, correlation einsums and mixer in bf16 with
  # fp32 accumulations (preferred_element_type) and fp32 normalization
  # statistics; heads and soft-argmax stay fp32.
  compute_dtype: str = "float32"
  # Inference speed mode: run the mixer's channel MLPs in w8a8 int8 (per-row
  # dynamic activation scales, per-column weight scales, int32 MXU
  # accumulation — 2x MXU rate on v5e). Temporal convs, LayerNorms, heads
  # and correlation stay in compute_dtype. Opt-in; measured accuracy drift
  # is documented in PERFORMANCE.md.
  quantized_mixer: bool = False
  # Inference speed mode: run the ExtraConvs stack (BootsTAPIR) in w8a8 int8
  # (per-output-channel weight scales, int32 MXU accumulation). At 480p
  # ExtraConvs is ~43 TFLOP near the bf16 MXU floor; int8 runs it at ~1.7x.
  # LayerNorms/GELUs/residuals stay in compute_dtype. True = per-frame
  # activation scales (fastest); "per_pixel" = per-pixel scales via the
  # fused Pallas kernel — tighter quantization error at ~60% of the int8
  # speedup (see layers.ExtraConvs and PERFORMANCE.md for the measured
  # speed/drift ladder). Opt-in.
  quantized_extra_convs: "bool | str" = False
  # Inference speed mode: run the local-correlation contraction of the
  # fused corr+tents kernel in w8a8 int8 (int32 MXU accumulation, bf16
  # tents). "per_frame" = scalar grid + per-descriptor query scales, all
  # folded into the kernel output (zero added in-kernel work; recommended).
  # True = per-position grid scales applied in-kernel — tighter
  # quantization but measured SLOWER end-to-end at 480p (the kernel is
  # VPU-bound). Also halves the kernel's feature-grid HBM reads. Requires
  # use_fused_corr. Opt-in; measured AJ deltas in PERFORMANCE.md.
  quantized_corr: "bool | str" = False
  # NOTE: a quantized_backbone (w8a8 ResNet) mode existed briefly and was
  # REMOVED after end-to-end measurement showed no win (the backbone is
  # HBM-bound, not MXU-bound) — see PERFORMANCE.md dead ends.

  @property
  def dtype(self):
    return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def tapir_config(**overrides) -> "TapirConfig":
  """Standard (offline) TAPIR: reference configs/tapir_config.py:78-80."""
  kwargs = dict(pyramid_level=0, use_causal_conv=False)
  kwargs.update(overrides)
  return TapirConfig(**kwargs)


def causal_tapir_config(**overrides) -> "TapirConfig":
  """Online/causal TAPIR: reference configs/causal_tapir_config.py:78-79."""
  kwargs = dict(pyramid_level=1, use_causal_conv=True)
  kwargs.update(overrides)
  return TapirConfig(**kwargs)


def bootstapir_config(**overrides) -> "TapirConfig":
  """BootsTAPIR: reference configs/tapir_bootstrap_config.py:76-83."""
  kwargs = dict(
      pyramid_level=1,
      use_causal_conv=False,
      extra_convs=True,
      softmax_temperature=10.0,
  )
  kwargs.update(overrides)
  return TapirConfig(**kwargs)


def causal_bootstapir_config(**overrides) -> "TapirConfig":
  """Online BootsTAPIR (causal convs + extra convs)."""
  return bootstapir_config(use_causal_conv=True, **overrides)


class FeatureGrids(NamedTuple):
  """Backbone features per refinement resolution.

  resolutions holds zero-size [H, W, 0] arrays: pure shape carriers so the
  structure stays jittable (same trick as the reference, tapir_model.py:262).
  """

  lowres: Tuple[Array, ...]
  hires: Tuple[Array, ...]
  resolutions: Tuple[Array, ...]


class QueryFeatures(NamedTuple):
  """Per-query descriptors sampled from the feature grids."""

  lowres: Tuple[Array, ...]
  hires: Tuple[Array, ...]
  resolutions: Tuple[Array, ...]


class TapirCausalState(NamedTuple):
  """Typed streaming state for online TAPIR.

  One entry per refinement iteration, stacked: `pre` caches the last
  (kernel-1) frames entering each mixer block's first depthwise conv, `mid`
  the post-GELU hidden frames entering the second.
  Shapes: pre [I, L, B, N, k-1, hidden], mid [I, L, B, N, k-1, 4*hidden].
  """

  pre: Array
  mid: Array

  def num_points(self) -> int:
    return self.pre.shape[3]


# Query-axis position by rank for per-chunk output trees: points [I,B,c,T,2],
# occ/expd [I,B,c,T], causal state [I,L,B,c,k-1,d].
_QUERY_AXIS = {4: 2, 5: 2, 6: 3}


def _avg_pool_2x(x: Array) -> Array:
  """2x2 VALID average pool over the spatial dims of [B, T, H, W, C]."""
  b, t, h, w, c = x.shape
  x = x[:, :, : h // 2 * 2, : w // 2 * 2]
  x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
  return x.mean(axis=(3, 5))


def _l2_normalize(x: Array) -> Array:
  xf = x.astype(jnp.float32)
  out = xf * jax.lax.rsqrt(
      jnp.maximum(jnp.sum(jnp.square(xf), axis=-1, keepdims=True), 1e-12)
  )
  return out.astype(x.dtype)


def _tent_weights(coords: Array, size: int, patch_size: int) -> Array:
  """Separable bilinear "tent" weight matrices for patch extraction.

  For each center coordinate c (index space), offset d in
  [-(p-1)/2, (p-1)/2], the weight on integer cell i is
  max(0, 1 - |c + d - i|); cells outside [0, size) simply don't exist, which
  reproduces `constant` (zero) boundary handling.

  Args:
    coords: [...] center coordinates in index space (raster - 0.5).
    size: grid extent along this axis.
    patch_size: number of taps (odd).

  Returns:
    [..., patch_size, size] weights.
  """
  offsets = jnp.arange(patch_size, dtype=coords.dtype) - (patch_size - 1) / 2
  cells = jnp.arange(size, dtype=coords.dtype)
  centers = coords[..., None] + offsets  # [..., p]
  return jax.nn.relu(1.0 - jnp.abs(centers[..., None] - cells))


def _gather_tent_patches(
    corrs: Array, cy: Array, cx: Array, p: int
) -> Array:
  """Tent-weighted p x p patches via row/column gathers.

  Equivalent to the separable tent-matmul extraction: the tent weight of
  tap d on cell i is relu(1 - |c + d - i|), i.e. bilinear interpolation at
  position c + d, so each tap is a 2-cell fractional blend. We gather the
  p+1 integer rows/columns spanning all taps with take_along_axis and blend
  adjacent pairs; out-of-range cells contribute zero (constant-mode
  boundary), enforced by masking instead of index clipping.

  Args:
    corrs: [B, N, T, H, W].
    cy / cx: [B, N, T] patch centers in index space.
    p: taps per axis (odd).

  Returns:
    [B, N, T, p, p].
  """
  h, w = corrs.shape[3:5]
  half = (p - 1) // 2
  dtype = corrs.dtype

  def prep(c, size):
    c0 = jnp.floor(c).astype(jnp.int32)
    frac = (c - c0).astype(dtype)
    idx = c0[..., None] + jnp.arange(-half, half + 2)  # [..., p+1]
    valid = ((idx >= 0) & (idx < size)).astype(dtype)
    return jnp.clip(idx, 0, size - 1), frac, valid

  ry, fy, vy = prep(cy, h)
  rx, fx, vx = prep(cx, w)

  rows = jnp.take_along_axis(
      corrs, ry[..., None], axis=3
  )  # [B, N, T, p+1, W]
  rows = rows * vy[..., None]
  rows = rows[..., :p, :] * (1 - fy)[..., None, None] + (
      rows[..., 1:, :] * fy[..., None, None]
  )
  patch = jnp.take_along_axis(
      rows, rx[..., None, :], axis=4
  )  # [B, N, T, p, p+1]
  patch = patch * vx[..., None, :]
  return patch[..., :p] * (1 - fx)[..., None, None] + (
      patch[..., 1:] * fx[..., None, None]
  )


class CostVolumeHead(nn.Module):
  """Stage-1 heads: cost volume -> position heatmap + occlusion/uncertainty.

  Reference behavior: tapir_model.py:399-471 (conv head shapes and the
  time-major einsum layout).
  """

  softmax_temperature: float = 20.0

  @nn.compact
  def __call__(
      self,
      query_feats: Array,  # [B, N, C]
      feature_grid: Array,  # [B, T, H, W, C]
      query_points: Optional[Array],  # [B, N, 3] tyx at initial res, or None
      im_shape: Sequence[int],  # [B, T, H_im, W_im, 3] at initial res
  ):
    b, t, h, w, _ = feature_grid.shape
    n = query_feats.shape[1]

    # Time-major cost volume: [T, B, N, H, W].
    cost = jnp.einsum(
        "bnc,bthwc->tbnhw",
        query_feats,
        feature_grid,
        preferred_element_type=jnp.float32,
    )
    cost = cost.reshape(t * b * n, h, w, 1)

    hid = jax.nn.relu(nn.Conv(16, (3, 3), name="pos_conv")(cost))

    pos = nn.Conv(1, (3, 3), name="pos_out")(hid)
    pos = pos.reshape(t, b, n, h, w).transpose(1, 2, 0, 3, 4)
    pos = jax.nn.softmax(
        pos * self.softmax_temperature, axis=(-2, -1)
    )
    points = sampling.heatmaps_to_points(
        pos, im_shape, query_points=query_points
    )

    occ = jax.nn.relu(
        nn.Conv(32, (3, 3), strides=2, name="occ_conv")(hid)
    )
    occ = occ.mean(axis=(-2, -3))
    occ = jax.nn.relu(nn.Dense(16, name="occ_dense")(occ))
    occ = nn.Dense(2, name="occ_out")(occ)
    occ = occ.reshape(t, b, n, 2)
    occlusion = occ[..., 0].transpose(1, 2, 0)
    expected_dist = occ[..., 1].transpose(1, 2, 0)
    return points, occlusion, expected_dist


class TAPIR(nn.Module):
  """TAPIR tracker. See module docstring.

  Public methods (mirroring the reference API surface,
  tapir_model.py:626-1203): `get_feature_grids`, `get_query_features`,
  `estimate_trajectories`, `__call__`, `construct_initial_causal_state`,
  `update_query_features`.
  """

  config: TapirConfig = TapirConfig()

  def setup(self):
    cfg = self.config
    backbone_cfg = resnet_lib.ResNetConfig(
        blocks_per_group=tuple(cfg.blocks_per_group),
        channels_per_group=(64, cfg.highres_dim, 256, cfg.lowres_dim),
        use_projection=(True, True, True, True),
        strides=(1, 2, 2, 1),
        resnet_v2=True,
        normalization="instancenorm",
        use_max_pool=False,
    )
    self.backbone = nn.remat(resnet_lib.ResNet)(config=backbone_cfg)
    if cfg.extra_convs:
      self.extra = ExtraConvs(quantized=cfg.quantized_extra_convs)
    self.cost_volume_head = CostVolumeHead(
        softmax_temperature=cfg.softmax_temperature
    )
    self.mixer = PipsMixer(
        output_channels=4 + cfg.highres_dim + cfg.lowres_dim,
        hidden_dim=cfg.mixer_hidden_dim,
        num_blocks=cfg.num_mixer_blocks,
        kernel_size=cfg.mixer_kernel_size,
        causal=cfg.use_causal_conv,
        quantized=cfg.quantized_mixer,
    )

  # ---------------------------------------------------------------- features

  def get_feature_grids(
      self,
      video: Array,
      refinement_resolutions: Optional[List[Tuple[int, int]]] = None,
  ) -> FeatureGrids:
    """Runs the backbone at every required resolution.

    Args:
      video: [B, T, H, W, 3] in [-1, 1].
      refinement_resolutions: (height, width) list; inferred log-spaced from
        the video size if None.

    Returns:
      FeatureGrids with one entry per (initial + refinement) resolution.
    """
    cfg = self.config
    if refinement_resolutions is None:
      refinement_resolutions = sampling.generate_default_resolutions(
          video.shape[2:4], cfg.initial_resolution
      )
    all_resolutions = [cfg.initial_resolution] + list(
        map(tuple, refinement_resolutions)
    )

    lowres, hires, resolutions = [], [], []
    cached: Dict[Tuple[int, int], Tuple[Array, Array]] = {}
    # One cast up front: the per-resolution resizes then run in the compute
    # dtype (bf16 in production), halving resize traffic over the full
    # video instead of casting each resized copy separately.
    video_c = video.astype(cfg.dtype)
    for resolution in all_resolutions:
      if resolution[0] % 8 != 0 or resolution[1] % 8 != 0:
        raise ValueError("Image resolution must be a multiple of 8.")
      if resolution not in cached:
        if resolution == tuple(video.shape[2:4]):
          resized = video_c
        else:
          resized = jax.image.resize(
              video_c,
              video.shape[0:2] + resolution + (3,),
              method="bilinear",
          )
        latent, hi = self._backbone_features(resized)
        cached[resolution] = (_l2_normalize(latent), _l2_normalize(hi))
      lo, hi = cached[resolution]
      lowres.append(lo)
      hires.append(hi)
      resolutions.append(jnp.zeros(resolution + (0,), video.dtype))

    return FeatureGrids(tuple(lowres), tuple(hires), tuple(resolutions))

  def _backbone_features(self, video: Array) -> Tuple[Array, Array]:
    """ResNet over frames, optionally chunked over time to bound memory."""
    cfg = self.config
    b, t = video.shape[:2]
    chunk = cfg.feature_extractor_chunk_size

    def run(frames):  # [M, H, W, 3] -> (lowres, hires)
      feats = self.backbone(frames)
      return feats["group_3"], feats["group_1"]

    if chunk is None or chunk >= t:
      lo, hi = run(video.reshape((b * t,) + video.shape[2:]))
    else:
      los, his = [], []
      for i in range(0, t, chunk):
        part = video[:, i : i + chunk]
        m = part.shape[1]
        l, h = run(part.reshape((b * m,) + part.shape[2:]))
        los.append(l.reshape((b, m) + l.shape[1:]))
        his.append(h.reshape((b, m) + h.shape[1:]))
      lo = jnp.concatenate(los, axis=1).reshape((b * t,) + los[0].shape[2:])
      hi = jnp.concatenate(his, axis=1).reshape((b * t,) + his[0].shape[2:])

    if cfg.extra_convs:
      lo = self.extra(lo)
    lo = lo.reshape((b, t) + lo.shape[1:])
    hi = hi.reshape((b, t) + hi.shape[1:])
    return lo, hi

  # ------------------------------------------------------------- query feats

  def get_query_features(
      self,
      video_shape: Sequence[int],
      query_points: Array,
      feature_grids: FeatureGrids,
  ) -> QueryFeatures:
    """Samples per-query descriptors from every resolution's grids.

    Args:
      video_shape: [B, T, H, W, C] of the source video.
      query_points: [B, N, 3] (t, y, x) raster points in video coordinates.
      feature_grids: output of `get_feature_grids`.

    Returns:
      QueryFeatures with per-resolution [B, N, C] descriptors.
    """
    def sample(grid, pos_tyx):
      if not self.config.parallelize_query_extraction:
        return sampling.sample_grid_batched(grid, pos_tyx)
      # Per-frame gather + one-hot frame mask: every frame samples every
      # query's (y, x), then the wrong frames are masked out. Under a
      # frame-sharded mesh this keeps gathers local instead of all-gathering
      # the full video grid (reference: tapir_model.py:793-833).
      t = grid.shape[1]
      per_frame = jax.vmap(  # over batch
          jax.vmap(sampling.sample_grid_2d, in_axes=(0, None))
      )(grid, pos_tyx[..., 1:])  # [B, T, N, C]
      frame_id = jnp.round(pos_tyx[..., 0]).astype(jnp.int32)  # [B, N]
      is_frame = jax.nn.one_hot(frame_id, t, axis=1)  # [B, T, N]
      return jnp.sum(per_frame * is_frame[..., None], axis=1)

    lowres_feats, hires_feats = [], []
    cached: Dict[Tuple[int, int], Tuple[Array, Array]] = {}
    for i, res in enumerate(feature_grids.resolutions):
      key = res.shape[:2]
      if key not in cached:
        pos_low = transforms.convert_grid_coordinates(
            query_points,
            tuple(video_shape)[1:4],
            feature_grids.lowres[i].shape[1:4],
            coordinate_format="tyx",
        )
        pos_hi = transforms.convert_grid_coordinates(
            query_points,
            tuple(video_shape)[1:4],
            feature_grids.hires[i].shape[1:4],
            coordinate_format="tyx",
        )
        lo = sample(feature_grids.lowres[i], pos_low)
        hi = sample(feature_grids.hires[i], pos_hi)
        cached[key] = (lo, hi)
      lo, hi = cached[key]
      lowres_feats.append(lo)
      hires_feats.append(hi)

    return QueryFeatures(
        tuple(lowres_feats), tuple(hires_feats), feature_grids.resolutions
    )

  # -------------------------------------------------------------- refinement

  def _corr_patches(
      self,
      grid: Array,  # [B, T, H, W, C]
      query: Array,  # [B, N, C] (first iter) or [B, N, T, C]
      pos_guess: Array,  # [B, N, T, 2] xy at initial resolution
      orig_hw: Tuple[int, int],
  ) -> Array:
    """7x7 local correlation around the current track.

    Matmul path (TPU): full [B,N,T,H,W] correlation einsum on the MXU, then
    two tent-weight matmuls extract a bilinearly-interpolated patch.
    Gather path (CPU): sample the 49 neighborhood features and contract.
    Both equal the reference's two equivalent paths (tapir_model.py:494-563).
    """
    cfg = self.config
    p = cfg.patch_size
    orig_h, orig_w = orig_hw
    # Pre-quantized per-frame int8 grids arrive as (int8, [B, T] scale)
    # tuples (see estimate_trajectories; quantization hoisted out of the
    # chunk/iteration loops).
    prequant = isinstance(grid, tuple)
    grid_arr = grid[0] if prequant else grid
    h, w = grid_arr.shape[2:4]
    # (y, x) in grid raster coords.
    coords = transforms.convert_grid_coordinates(
        pos_guess, (orig_w, orig_h), (w, h)
    )[..., ::-1]

    per_frame_query = query.ndim == 4

    if cfg.use_matmul_corr and cfg.use_fused_corr and not cfg.use_gather_tents:
      # Fused Pallas path: correlation + tent extraction in one kernel, no
      # HBM correlation volume (ops/corr_tents.py).
      from tapnet_tpu.ops import corr_tents

      b, t = grid_arr.shape[:2]
      n = query.shape[1]
      if per_frame_query:
        q_bt = query.transpose(0, 2, 1, 3)
      else:
        q_bt = jnp.broadcast_to(
            query[:, None], (b, t) + query.shape[1:]
        )
      q_bt = q_bt.reshape(b * t, n, -1).astype(cfg.dtype)
      cyx = coords - 0.5  # [B, N, T, 2] (y, x) index space
      cy = cyx[..., 0].transpose(0, 2, 1).reshape(b * t, n)
      cx = cyx[..., 1].transpose(0, 2, 1).reshape(b * t, n)
      if prequant:
        g_bt = grid_arr.reshape((b * t,) + grid_arr.shape[2:])
        scale_bt = grid[1].reshape(b * t)
        pat = corr_tents.corr_tent_patches_prequantized(
            g_bt, scale_bt, q_bt, cy, cx, p
        )
      else:
        grid_bt = grid.reshape(
            (b * t,) + grid.shape[2:]
        ).astype(cfg.dtype)
        pat = corr_tents.corr_tent_patches(
            grid_bt, q_bt, cy, cx, p, cfg.quantized_corr
        )
      # [B*T, p, p, N] -> [B, N, T, p*p]
      pat = pat.reshape(b, t, p, p, n).transpose(0, 4, 1, 2, 3)
      return pat.reshape(b, n, t, p * p)

    if cfg.use_matmul_corr:
      # fp32 accumulation on the MXU, compute-dtype intermediates: the full
      # [B,N,T,H,W] correlation map dominates HBM traffic at high res, so
      # materialize it (and the tent weights) in the compute dtype.
      if per_frame_query:
        corrs = jnp.einsum(
            "bthwc,bntc->bnthw",
            grid,
            query,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
      else:
        corrs = jnp.einsum(
            "bthwc,bnc->bnthw",
            grid,
            query,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
      if cfg.use_gather_tents:
        patches = _gather_tent_patches(
            corrs, coords[..., 0] - 0.5, coords[..., 1] - 0.5, p
        )
      else:
        wy = _tent_weights(coords[..., 0] - 0.5, h, p).astype(cfg.dtype)
        wx = _tent_weights(coords[..., 1] - 0.5, w, p).astype(cfg.dtype)
        patches = jnp.einsum(
            "bntph,bnthw->bntpw",
            wy,
            corrs,
            preferred_element_type=jnp.float32,
        ).astype(cfg.dtype)
        patches = jnp.einsum(
            "bntqw,bntpw->bntpq",
            wx,
            patches,
            preferred_element_type=jnp.float32,
        )
      b, n, t = patches.shape[:3]
      return patches.reshape(b, n, t, p * p)
    else:
      half = (p - 1) // 2
      dy, dx = jnp.meshgrid(
          jnp.arange(-half, half + 1), jnp.arange(-half, half + 1),
          indexing="ij",
      )
      offsets = jnp.stack([dy, dx], axis=-1).reshape(-1, 2)
      # [B, N, T, p*p, 2]
      pts = coords[..., None, :] + offsets[None, None, None]
      neigh = jax.vmap(  # over batch
          jax.vmap(  # over frames
              functools.partial(sampling.sample_grid_2d, mode="constant"),
              in_axes=(0, 1),
              out_axes=1,
          )
      )(grid, pts)  # [B, N, T, p*p, C]
      if per_frame_query:
        return jnp.einsum("bntsc,bntc->bnts", neigh, query)
      return jnp.einsum("bntsc,bnc->bnts", neigh, query)

  def _refine_pips(
      self,
      queries: Sequence[Array],
      pyramid: Sequence[Array],
      pos_guess: Array,
      occ_guess: Array,
      expd_guess: Array,
      orig_hw: Tuple[int, int],
      resize_hw: Tuple[int, int],
      mixer_feats: Optional[Array],
      cache: Optional[MixerCache],
      return_cache: bool,
  ):
    """One PIPs refinement step (reference: tapir_model.py:473-624)."""
    cfg = self.config
    corrs_pyr = []
    for pyridx, (query, grid) in enumerate(zip(queries, pyramid)):
      if mixer_feats is None:
        q = query
      else:
        if pyridx == 0:
          q = mixer_feats[..., : cfg.highres_dim]
        else:
          q = mixer_feats[..., cfg.highres_dim :]
      corrs_pyr.append(self._corr_patches(grid, q, pos_guess, orig_hw))
    corrs = jnp.concatenate(corrs_pyr, axis=-1)

    if mixer_feats is None:
      both = jnp.concatenate([queries[0], queries[1]], axis=-1)
      feats = jnp.broadcast_to(
          both[:, :, None, :], both.shape[:2] + (corrs.shape[2],) + both.shape[-1:]
      )
    else:
      feats = mixer_feats

    mlp_input = jnp.concatenate(
        [
            jnp.zeros_like(pos_guess),
            occ_guess[..., None],
            expd_guess[..., None],
            feats,
            corrs,
        ],
        axis=-1,
    )
    b, n, t, c = mlp_input.shape
    x = mlp_input.reshape(b * n, t, c).astype(cfg.dtype)
    if cache is not None:
      cache = jax.tree_util.tree_map(
          lambda v: v.reshape((v.shape[0], b * n) + v.shape[3:]), cache
      )
    res, new_cache = self.mixer(x, cache, return_cache)
    res = res.reshape(b, n, t, res.shape[-1])
    if return_cache:
      new_cache = jax.tree_util.tree_map(
          lambda v: v.reshape((v.shape[0], b, n) + v.shape[2:]), new_cache
      )

    orig_h, orig_w = orig_hw
    resized_h, resized_w = resize_hw
    pos_update = transforms.convert_grid_coordinates(
        res[..., :2], (resized_w, resized_h), (orig_w, orig_h)
    )
    return (
        pos_update + pos_guess,
        res[..., 2] + occ_guess,
        res[..., 3] + expd_guess,
        res[..., 4:] + feats,
        new_cache,
    )

  # ------------------------------------------------------------ trajectories

  def estimate_trajectories(
      self,
      video_size: Tuple[int, int],
      feature_grids: FeatureGrids,
      query_features: QueryFeatures,
      query_points_in_video: Optional[Array] = None,
      query_chunk_size: Optional[int] = None,
      causal_state: Optional[TapirCausalState] = None,
      get_causal_context: bool = False,
      is_training: bool = False,
  ) -> Mapping[str, Any]:
    """Stage 1 + stage 2 over all queries.

    Returns a dict with per-iteration lists under "tracks" / "occlusion" /
    "expected_dist" (index 0 = cost-volume init), and optionally
    "causal_context" (a TapirCausalState) when `get_causal_context`.
    """
    cfg = self.config
    if is_training and causal_state is not None:
      raise ValueError("Training with causal state is not supported.")

    num_resolutions = len(feature_grids.lowres) - 1
    num_iters = cfg.num_pips_iter * num_resolutions
    num_queries = query_features.lowres[0].shape[1]
    if query_chunk_size is None:
      query_chunk_size = num_queries

    def train2orig(x):
      return transforms.convert_grid_coordinates(
          x,
          cfg.initial_resolution[::-1],
          video_size[::-1],
          coordinate_format="xy",
      )

    # Randomize which chunk keeps refinement gradients during training
    # (reference: tapir_model.py:938-946).
    if is_training and self.has_rng("permutation"):
      perm = jax.random.permutation(
          self.make_rng("permutation"), num_queries
      )
    else:
      perm = jnp.arange(num_queries, dtype=jnp.int32)
    # argsort instead of a scatter: scatters hit an XLA TPU emitter bug and
    # sorts lower cleanly.
    inv_perm = jnp.argsort(perm)

    # Precompute the per-level pyramids once (chunk-independent).
    pyramids = []
    for level in range(1, num_resolutions + 1):
      pyramid = [
          feature_grids.hires[level],
          feature_grids.lowres[level],
      ]
      for _ in range(cfg.pyramid_level):
        pyramid.append(_avg_pool_2x(pyramid[-1]))
      pyramids.append(pyramid)

    if (
        cfg.quantized_corr == "per_frame"
        and not is_training  # prequantized path is inference-only (no VJP)
        and cfg.use_matmul_corr
        and cfg.use_fused_corr
        and not cfg.use_gather_tents
    ):
      # Per-frame int8 correlation: quantize each pyramid grid ONCE here
      # (chunk- and iteration-independent) — re-quantizing inside the
      # loops was measured to cost more than the int8 MXU saving
      # (PERFORMANCE.md r5). _corr_patches receives (int8, scale) tuples.
      from tapnet_tpu.ops import corr_tents as corr_tents_lib

      pyramids = [
          [
              corr_tents_lib.quantize_per_frame(g.astype(cfg.dtype))
              for g in pyr
          ]
          for pyr in pyramids
      ]

    im_shape = (
        feature_grids.lowres[0].shape[0:2] + cfg.initial_resolution + (3,)
    )
    num_frames = feature_grids.lowres[0].shape[1]

    def track_chunk(mdl, xs):
      """Stage 1 + all refinement iterations for one query chunk.

      Returns (stacked per-iteration outputs, optional new cache state).
      """
      points, occlusion, expected_dist = mdl.cost_volume_head(
          xs["qf_low"][0], feature_grids.lowres[0], xs.get("qp"), im_shape
      )
      pts_i = [train2orig(points)]
      occ_i = [occlusion]
      expd_i = [expected_dist]
      init_occ, init_expd = occlusion, expected_dist

      mixer_feats = None
      iter_caches = []
      for i in range(num_iters):
        level = i // cfg.num_pips_iter + 1
        queries = [xs["qf_hi"][level], xs["qf_low"][level]]
        for _ in range(cfg.pyramid_level):
          queries.append(queries[-1])

        cache_i = None
        if causal_state is not None:
          cache_i = MixerCache(
              pre=xs["state_pre"][i], mid=xs["state_mid"][i]
          )

        refined = mdl._refine_pips(  # pylint: disable=protected-access
            queries,
            pyramids[level - 1],
            points,
            occlusion,
            expected_dist,
            orig_hw=cfg.initial_resolution,
            resize_hw=feature_grids.resolutions[level].shape[:2],
            mixer_feats=mixer_feats,
            cache=cache_i,
            return_cache=get_causal_context,
        )
        points, occlusion, expected_dist, mixer_feats, new_cache = refined
        iter_caches.append(new_cache)
        pts_i.append(train2orig(points))
        occ_i.append(occlusion)
        expd_i.append(expected_dist)
        if (i + 1) % cfg.num_pips_iter == 0:
          # Reset for the next resolution: start from the stage-1 estimate.
          mixer_feats = None
          occlusion, expected_dist = init_occ, init_expd

      outs = dict(
          points=jnp.stack(pts_i),
          occ=jnp.stack(occ_i),
          expd=jnp.stack(expd_i),
      )
      if get_causal_context:
        outs["state_pre"] = jnp.stack([c.pre for c in iter_caches])
        outs["state_mid"] = jnp.stack([c.mid for c in iter_caches])
      return outs

    def chunk_inputs(perm_chunk):
      xs = dict(
          qf_low=jnp.stack(
              [qf[:, perm_chunk] for qf in query_features.lowres]
          ),
          qf_hi=jnp.stack(
              [qf[:, perm_chunk] for qf in query_features.hires]
          ),
      )
      if query_points_in_video is not None:
        xs["qp"] = transforms.convert_grid_coordinates(
            query_points_in_video[:, perm_chunk],
            (num_frames,) + tuple(video_size),
            (num_frames,) + cfg.initial_resolution,
            coordinate_format="tyx",
        )
      if causal_state is not None:
        xs["state_pre"] = causal_state.pre[:, :, :, perm_chunk]
        xs["state_mid"] = causal_state.mid[:, :, :, perm_chunk]
      return xs

    num_chunks = -(-num_queries // query_chunk_size)

    if is_training or num_chunks == 1:
      # Static loop: supports per-chunk stop_gradient for training and
      # ragged last chunks; a single chunk needs no scan machinery.
      chunk_outs = []
      for ch_idx, ch in enumerate(range(0, num_queries, query_chunk_size)):
        outs = track_chunk(self, chunk_inputs(perm[ch : ch + query_chunk_size]))
        if is_training and ch_idx > 0:
          # Only the first (random) chunk trains the refinement stage
          # (reference: tapir_model.py:1024-1025); stage-1 (index 0) keeps
          # its gradient for every chunk.
          outs = dict(
              outs,
              points=jnp.concatenate(
                  [
                      outs["points"][:1],
                      jax.lax.stop_gradient(outs["points"][1:]),
                  ]
              ),
              occ=jnp.concatenate(
                  [outs["occ"][:1], jax.lax.stop_gradient(outs["occ"][1:])]
              ),
              expd=jnp.concatenate(
                  [outs["expd"][:1], jax.lax.stop_gradient(outs["expd"][1:])]
              ),
          )
        chunk_outs.append(outs)
      # Concatenate (possibly ragged) chunks along the query axis, unpermute.
      merged_ragged = jax.tree_util.tree_map(
          lambda *xs: jnp.concatenate(xs, axis=_QUERY_AXIS[xs[0].ndim]),
          *chunk_outs,
      )
      points = list(merged_ragged["points"][:, :, inv_perm])
      occlusion = list(merged_ragged["occ"][:, :, inv_perm])
      expd = list(merged_ragged["expd"][:, :, inv_perm])
      out: Dict[str, Any] = dict(
          occlusion=occlusion, tracks=points, expected_dist=expd
      )
      if get_causal_context:
        out["causal_context"] = TapirCausalState(
            pre=merged_ragged["state_pre"][:, :, :, inv_perm],
            mid=merged_ragged["state_mid"][:, :, :, inv_perm],
        )
      return out
    else:
      # Inference: scan over query chunks — one traced/compiled chunk body
      # regardless of query count (vs. the reference's unrolled loop with
      # fake barriers, tapir_model.py:949-1041). Pad queries to a multiple
      # of the chunk size; chunks are independent, so padding is sliced off
      # afterward without affecting results.
      padded = num_chunks * query_chunk_size
      perm_padded = jnp.concatenate(
          [perm, jnp.zeros(padded - num_queries, perm.dtype)]
      )
      perm_mat = perm_padded.reshape(num_chunks, query_chunk_size)
      xs_all = jax.vmap(chunk_inputs)(perm_mat)

      def scan_fn(mdl, carry, xs):
        return carry, track_chunk(mdl, xs)

      scanned = nn.scan(
          scan_fn,
          variable_broadcast="params",
          split_rngs={"params": False},
          in_axes=0,
          out_axes=0,
      )
      _, stacked = scanned(self, 0, xs_all)

    # stacked: points [C, iters+1, B, c, T, 2]; merge chunk axes, unpermute,
    # drop padding.
    def merge(x):
      # [C, I, B, c, ...] -> [I, B, C*c, ...]
      x = jnp.moveaxis(x, 0, 2)
      x = x.reshape(x.shape[0], x.shape[1], -1, *x.shape[4:])
      return x[:, :, : num_queries][:, :, inv_perm]

    points = list(merge(stacked["points"]))
    occlusion = list(merge(stacked["occ"]))
    expd = list(merge(stacked["expd"]))

    out: Dict[str, Any] = dict(
        occlusion=occlusion, tracks=points, expected_dist=expd
    )
    if get_causal_context:
      # [C, I, L, B, c, ...] -> [I, L, B, C*c, ...]
      def merge_state(x):
        x = jnp.moveaxis(x, 0, 4)
        x = x.reshape(*x.shape[:3], -1, *x.shape[5:])
        return x[:, :, :, : num_queries][:, :, :, inv_perm]

      out["causal_context"] = TapirCausalState(
          pre=merge_state(stacked["state_pre"]),
          mid=merge_state(stacked["state_mid"]),
      )
    return out

  # ----------------------------------------------------------------- forward

  def __call__(
      self,
      video: Array,
      query_points: Array,
      query_chunk_size: Optional[int] = None,
      refinement_resolutions: Optional[List[Tuple[int, int]]] = None,
      feature_grids: Optional[FeatureGrids] = None,
      is_training: bool = False,
  ) -> Mapping[str, Any]:
    """Full forward pass.

    Args:
      video: [B, T, H, W, 3] in [-1, 1].
      query_points: [B, N, 3] (t, y, x) raster points in video coordinates.
      query_chunk_size: memory-bounding chunk over queries.
      refinement_resolutions: optional explicit refinement sizes.
      feature_grids: reuse precomputed grids.
      is_training: enables gradient-chunk permutation.

    Returns:
      dict with "tracks" [B, N, T, 2] (x, y raster), "occlusion" and
      "expected_dist" logits [B, N, T], plus per-iteration "unrefined_*".
    """
    cfg = self.config
    if feature_grids is None:
      feature_grids = self.get_feature_grids(video, refinement_resolutions)

    query_features = self.get_query_features(
        video.shape, query_points, feature_grids
    )

    trajectories = self.estimate_trajectories(
        video.shape[-3:-1],
        feature_grids,
        query_features,
        query_points_in_video=query_points,
        query_chunk_size=query_chunk_size,
        is_training=is_training,
    )

    # Final prediction: mean over the last refinement of each resolution.
    p = cfg.num_pips_iter
    out = dict(
        occlusion=jnp.mean(
            jnp.stack(trajectories["occlusion"][p::p]), axis=0
        ),
        tracks=jnp.mean(jnp.stack(trajectories["tracks"][p::p]), axis=0),
        expected_dist=jnp.mean(
            jnp.stack(trajectories["expected_dist"][p::p]), axis=0
        ),
        unrefined_occlusion=trajectories["occlusion"][:-1],
        unrefined_tracks=trajectories["tracks"][:-1],
        unrefined_expected_dist=trajectories["expected_dist"][:-1],
    )
    return out

  # ------------------------------------------------------------ online state

  def construct_initial_causal_state(
      self, batch_size: int, num_points: int, num_resolutions: int = 1
  ) -> TapirCausalState:
    """Zero streaming state for `num_points` tracks."""
    cfg = self.config
    k = cfg.mixer_kernel_size - 1
    i = cfg.num_pips_iter * num_resolutions
    l = cfg.num_mixer_blocks
    return TapirCausalState(
        pre=jnp.zeros(
            (i, l, batch_size, num_points, k, cfg.mixer_hidden_dim),
            jnp.float32,
        ),
        mid=jnp.zeros(
            (i, l, batch_size, num_points, k, cfg.mixer_hidden_dim * 4),
            jnp.float32,
        ),
    )


def update_query_features(
    query_features: QueryFeatures,
    new_query_features: QueryFeatures,
    idx_to_update: Sequence[int],
    causal_state: Optional[TapirCausalState] = None,
    fresh_state: Optional[TapirCausalState] = None,
):
  """Scatter new query descriptors (and reset their streaming state) into
  existing structures; used by the online demo's click-to-track flow
  (reference: tapir_model.py:1172-1203)."""
  idx = jnp.asarray(idx_to_update)

  def set_queries(old, new):
    return old.at[:, idx].set(new)

  qf = QueryFeatures(
      lowres=jax.tree_util.tree_map(
          set_queries, query_features.lowres, new_query_features.lowres
      ),
      hires=jax.tree_util.tree_map(
          set_queries, query_features.hires, new_query_features.hires
      ),
      resolutions=query_features.resolutions,
  )
  if causal_state is None:
    return qf
  if fresh_state is None:
    raise ValueError("fresh_state required to reset causal state.")
  new_state = jax.tree_util.tree_map(
      lambda old, new: old.at[:, :, :, idx].set(new), causal_state, fresh_state
  )
  return qf, new_state
