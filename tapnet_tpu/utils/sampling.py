"""Vectorized bilinear sampling and soft-argmax primitives.

These are the L0 numerics of the TAP stack (reference behavior:
tapnet/utils/model_utils.py:177-314). The reference composes a scalar
`map_coordinates` under four nested vmaps; here everything is written as one
batched gather + weighted sum, which XLA lowers to a single fused gather on
TPU and which Pallas kernels can later replace wholesale.

Conventions (must match the reference bit-for-bit at fp32):
  * Raster coordinates: (0, 0) is the corner of the top-left pixel; the pixel
    center is at +0.5. Sampling therefore subtracts 0.5 before indexing.
  * Time ("t" of tyx) is frame coordinates: frame centers are at integers, so
    no 0.5 shift is applied on the t axis.
  * mode="nearest": out-of-range corner indices are clamped (edge replicate).
  * mode="constant": out-of-range corners contribute zero.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tapnet_tpu.utils import transforms

Array = jnp.ndarray


def _corner_weights_1d(coord: Array, size: int, mode: str):
  """Returns ((idx0, w0), (idx1, w1)) for linear interpolation on one axis.

  `coord` is in index space (0 = center of first element). Out-of-range
  handling matches jax.scipy.ndimage.map_coordinates(order=1).
  """
  lower = jnp.floor(coord)
  frac = coord - lower
  i0 = lower.astype(jnp.int32)
  i1 = i0 + 1
  w0 = 1.0 - frac
  w1 = frac
  if mode == "nearest":
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    return (i0c, w0), (i1c, w1)
  elif mode == "constant":
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i1 >= 0) & (i1 < size)
    i0c = jnp.clip(i0, 0, size - 1)
    i1c = jnp.clip(i1, 0, size - 1)
    return (i0c, w0 * v0), (i1c, w1 * v1)
  raise ValueError(f"Unknown mode: {mode!r}")


def sample_grid_2d(
    grid: Array, points_yx: Array, mode: str = "nearest"
) -> Array:
  """Bilinear-sample a feature grid at raster points.

  Args:
    grid: [H, W, C] feature grid.
    points_yx: [..., 2] points as (y, x) in raster coordinates.
    mode: "nearest" (clamp) or "constant" (zero outside).

  Returns:
    [..., C] sampled features.
  """
  h, w, c = grid.shape
  batch_shape = points_yx.shape[:-1]
  pts = points_yx.reshape(-1, 2) - 0.5
  (y0, wy0), (y1, wy1) = _corner_weights_1d(pts[:, 0], h, mode)
  (x0, wx0), (x1, wx1) = _corner_weights_1d(pts[:, 1], w, mode)

  flat = grid.reshape(h * w, c)

  def gather(iy, ix):
    return jnp.take(flat, iy * w + ix, axis=0)

  out = (
      gather(y0, x0) * (wy0 * wx0)[:, None]
      + gather(y0, x1) * (wy0 * wx1)[:, None]
      + gather(y1, x0) * (wy1 * wx0)[:, None]
      + gather(y1, x1) * (wy1 * wx1)[:, None]
  )
  return out.reshape(batch_shape + (c,))


def sample_grid_3d(
    grid: Array, points_tyx: Array, mode: str = "nearest"
) -> Array:
  """Trilinear-sample a video feature grid at (t, y, x) points.

  t is in frame coordinates (integer = exact frame); y/x are raster.

  Args:
    grid: [T, H, W, C] feature grid.
    points_tyx: [..., 3] points as (t, y, x).
    mode: "nearest" or "constant".

  Returns:
    [..., C] sampled features.
  """
  t, h, w, c = grid.shape
  batch_shape = points_tyx.shape[:-1]
  pts = points_tyx.reshape(-1, 3)
  # No 0.5 shift on the time axis (frame coordinates).
  (t0, wt0), (t1, wt1) = _corner_weights_1d(pts[:, 0], t, mode)
  (y0, wy0), (y1, wy1) = _corner_weights_1d(pts[:, 1] - 0.5, h, mode)
  (x0, wx0), (x1, wx1) = _corner_weights_1d(pts[:, 2] - 0.5, w, mode)

  flat = grid.reshape(t * h * w, c)

  def gather(it, iy, ix):
    return jnp.take(flat, (it * h + iy) * w + ix, axis=0)

  out = jnp.zeros((pts.shape[0], c), grid.dtype)
  for it, wt in ((t0, wt0), (t1, wt1)):
    for iy, wy in ((y0, wy0), (y1, wy1)):
      for ix, wx in ((x0, wx0), (x1, wx1)):
        out = out + gather(it, iy, ix) * (wt * wy * wx)[:, None]
  return out.reshape(batch_shape + (c,))


def sample_grid_batched(
    grid: Array, points: Array, mode: str = "nearest"
) -> Array:
  """Batched sampling: grid [B, (T,) H, W, C], points [B, ..., 2 or 3]."""
  fn = sample_grid_3d if points.shape[-1] == 3 else sample_grid_2d
  return jax.vmap(functools.partial(fn, mode=mode))(grid, points)


def soft_argmax_heatmap(
    softmax_val: Array, threshold: float = 5.0
) -> Array:
  """Thresholded soft-argmax over heatmaps (batched).

  Finds the hard argmax cell, then averages the raster coordinates of cells
  within `threshold` of it, weighted by the heatmap values.

  Args:
    softmax_val: [..., H, W] non-negative heatmaps (each summing to ~1).
    threshold: radius (in cells) of the averaging window around the argmax.

  Returns:
    [..., 2] soft-argmax points as (x, y) in raster coordinates of the grid.
  """
  h, w = softmax_val.shape[-2:]
  batch_shape = softmax_val.shape[:-2]
  flat = softmax_val.reshape(-1, h * w)

  # Raster-center coordinate grids.
  ys = jnp.arange(h, dtype=softmax_val.dtype) + 0.5
  xs = jnp.arange(w, dtype=softmax_val.dtype) + 0.5
  coord_y = jnp.broadcast_to(ys[:, None], (h, w)).reshape(-1)
  coord_x = jnp.broadcast_to(xs[None, :], (h, w)).reshape(-1)

  argmax_idx = jnp.argmax(flat, axis=-1)
  peak_y = jnp.take(coord_y, argmax_idx)[:, None]
  peak_x = jnp.take(coord_x, argmax_idx)[:, None]

  dist2 = (coord_y[None, :] - peak_y) ** 2 + (coord_x[None, :] - peak_x) ** 2
  valid = (dist2 < threshold**2).astype(softmax_val.dtype)

  weights = flat * valid
  denom = jnp.maximum(jnp.sum(weights, axis=-1), 1e-12)
  out_x = jnp.sum(weights * coord_x[None, :], axis=-1) / denom
  out_y = jnp.sum(weights * coord_y[None, :], axis=-1) / denom
  return jnp.stack([out_x, out_y], axis=-1).reshape(batch_shape + (2,))


def heatmaps_to_points(
    all_pairs_softmax: Array,
    image_shape: Sequence[int],
    threshold: float = 5.0,
    query_points: Optional[Array] = None,
) -> Array:
  """Soft-argmax heatmaps into image-resolution points.

  Args:
    all_pairs_softmax: [B, N, T, H, W] heatmaps.
    image_shape: [B, T, H_im, W_im, C] shape of the source video.
    threshold: soft-argmax radius.
    query_points: optional [B, N, 3] (t, y, x) raster points to reproduce
      verbatim on their query frames.

  Returns:
    [B, N, T, 2] points as (x, y) in image raster coordinates.
  """
  out_points = soft_argmax_heatmap(all_pairs_softmax, threshold)

  feat_shape = all_pairs_softmax.shape[1:]  # (N, T, H, W)
  if feat_shape[1] != image_shape[1]:
    raise ValueError("Heatmap frame count must match image frame count.")
  out_points = transforms.convert_grid_coordinates(
      out_points, feat_shape[3:1:-1], tuple(image_shape)[3:1:-1]
  )

  if query_points is not None:
    # Only the frame index matters; heatmap T == image T, so it's unchanged,
    # but keep the conversion for clarity with differing spatial sizes.
    query_frame = transforms.convert_grid_coordinates(
        query_points,
        tuple(image_shape)[1:4],
        feat_shape[1:4],
        coordinate_format="tyx",
    )[..., 0]
    query_frame = jnp.round(query_frame).astype(jnp.int32)
    frame_ids = jnp.arange(image_shape[1], dtype=jnp.int32)
    is_query = (query_frame[..., None] == frame_ids[None, None, :]).astype(
        out_points.dtype
    )[..., None]
    query_xy = query_points[:, :, None, 2:0:-1]
    out_points = out_points * (1.0 - is_query) + query_xy * is_query

  return out_points


def generate_default_resolutions(
    full_size: Tuple[int, int],
    train_size: Tuple[int, int],
    num_levels: Optional[int] = None,
) -> Sequence[Tuple[int, int]]:
  """Log-spaced (height, width) resolutions from train_size up to full_size."""
  import numpy as np  # host-side shape math only

  if all(x == y for x, y in zip(train_size, full_size)):
    return [tuple(train_size)]

  if num_levels is None:
    size_ratio = np.array(full_size) / np.array(train_size)
    num_levels = int(np.ceil(np.max(np.log2(size_ratio))) + 1)
  if num_levels <= 1:
    return [tuple(train_size)]

  h, w = full_size[:2]
  ll_h, ll_w = train_size[:2]
  sizes = []
  for i in range(num_levels):
    frac = i / (num_levels - 1)
    sizes.append((
        int(round((ll_h * (h / ll_h) ** frac) // 8)) * 8,
        int(round((ll_w * (w / ll_w) ** frac) // 8)) * 8,
    ))
  return sizes


def preprocess_frames(frames: Array) -> Array:
  """uint8 [0, 255] frames -> float32 [-1, 1]."""
  return frames.astype(jnp.float32) / 255.0 * 2.0 - 1.0


def postprocess_occlusions(occlusions: Array, expected_dist: Array) -> Array:
  """Combine occlusion + uncertainty logits into a boolean visible flag."""
  return (1.0 - jax.nn.sigmoid(occlusions)) * (
      1.0 - jax.nn.sigmoid(expected_dist)
  ) > 0.5
