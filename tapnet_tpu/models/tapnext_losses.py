"""TAPNext training losses (kauldron-free).

Behavioral parity: tapnet/tapnext/losses.py:29-145 (Huber coordinate loss,
masked-L1 patch reconstruction, per-axis quantized-coordinate cross-entropy,
and the TAPIR-eq.(1) certainty BCE). All are plain functions returning
per-element values; callers mask/average as needed.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tapnet_tpu.utils.losses import sigmoid_binary_cross_entropy

Array = jnp.ndarray


def huber(
    pred_points: Array, target_points: Array, delta: float = 1.0
) -> Array:
  """Huber on (y, x) points; targets clipped to the 256 raster.

  Returns [..., 1] per-point values.
  """
  pred_points = pred_points.astype(jnp.float32)
  target_points = jnp.clip(target_points.astype(jnp.float32), 0, 255)
  error = jnp.clip(pred_points - target_points, -1e8, 1e8)
  distsqr = jnp.sum(jnp.square(error), axis=-1, keepdims=True)
  dist = jnp.sqrt(distsqr + 1e-12)
  return jnp.where(dist < delta, distsqr / 2, delta * (dist - delta / 2))


def masked_l1_patches(
    pred_patches: Array,
    target_patches: Array,
    image_norm: str = "sum",
) -> Array:
  """L1 patch-reconstruction loss over [..., T, h, w, C] patches."""
  loss = jnp.abs(
      pred_patches.astype(jnp.float32) - target_patches.astype(jnp.float32)
  )
  if image_norm == "sum":
    loss = jnp.sum(loss, axis=(-1, -2, -3)) / 1024.0
  elif image_norm == "mean":
    loss = jnp.mean(loss, axis=(-1, -2, -3))
  else:
    raise ValueError(f"Unknown image_norm {image_norm!r}")
  return jnp.mean(loss, axis=-1)[..., None]


def coordinate_cross_entropy(
    logits: Array, labels: Array, pixel_size: int = 256
) -> Array:
  """Per-axis softmax CE on quantized coordinates.

  Args:
    logits: [..., 2 * pixel_size] (first half axis-0, second half axis-1).
    labels: [..., 2] continuous raster coordinates (same axis order).

  Returns:
    [..., 1] summed CE of the two axes.
  """
  logits = logits.astype(jnp.float32)
  labels = labels.astype(jnp.float32) - 0.5
  labels = jnp.round(jnp.clip(labels, 0, pixel_size - 1)).astype(jnp.int32)
  logits_0, logits_1 = jnp.split(logits, 2, axis=-1)

  def ce(lg, lab):
    logp = jax.nn.log_softmax(lg, axis=-1)
    return -jnp.take_along_axis(logp, lab[..., None], axis=-1)

  return ce(logits_0, labels[..., 0]) + ce(logits_1, labels[..., 1])


def certainty(
    logits: Array,
    pred_points: Array,
    target_points: Array,
    threshold: float = 1.0,
) -> Array:
  """BCE on "was my prediction within threshold" (TAPIR eq. 1, term 3)."""
  pred = jax.lax.stop_gradient(pred_points.astype(jnp.float32))
  distsqr = jnp.sum(
      jnp.square(pred - target_points.astype(jnp.float32)),
      axis=-1,
      keepdims=True,
  )
  is_certain = (distsqr <= threshold**2).astype(jnp.float32)
  return sigmoid_binary_cross_entropy(logits.astype(jnp.float32), is_certain)


def tapnext_loss(
    results,
    target_points: Array,  # [B, Q, T, 2] (y, x) raster
    visible: Array,  # [B, Q, T] 1 = visible
    loss_mask: Optional[Array] = None,  # [B, Q, T]
    huber_delta: float = 1.0,
    certainty_threshold: float = 1.0,
    intermediate_weight: float = 1.0,
) -> Tuple[Array, dict]:
  """Combined TAPNext training loss with per-layer deep supervision.

  Position terms are masked to visible points; visibility BCE everywhere
  (within loss_mask).
  """
  if loss_mask is None:
    loss_mask = jnp.ones(visible.shape, jnp.float32)
  vis_mask = (loss_mask * visible)[..., None]
  any_mask = loss_mask[..., None]

  def terms(tracks, track_logits, visible_logits):
    l_coord = coordinate_cross_entropy(track_logits, target_points)
    l_huber = huber(tracks, target_points, delta=huber_delta)
    l_vis = sigmoid_binary_cross_entropy(
        visible_logits.astype(jnp.float32), visible[..., None]
    )
    coord = jnp.sum(l_coord * vis_mask) / jnp.maximum(vis_mask.sum(), 1.0)
    hub = jnp.sum(l_huber * vis_mask) / jnp.maximum(vis_mask.sum(), 1.0)
    vis = jnp.sum(l_vis * any_mask) / jnp.maximum(any_mask.sum(), 1.0)
    return coord, hub, vis

  coord, hub, vis = terms(
      results.tracks, results.track_logits, results.visible_logits
  )
  loss = coord + hub + vis
  scalars = {
      "coordinate_loss": coord,
      "huber_loss": hub,
      "visible_loss": vis,
  }
  inter = zip(
      results.intermediate_tracks,
      results.intermediate_track_logits,
      results.intermediate_visible_logits,
  )
  n_inter = len(results.intermediate_tracks)
  for i, (tr, lg, vl) in enumerate(inter):
    c, h, v = terms(tr, lg, vl)
    loss = loss + intermediate_weight * (c + h + v) / max(n_inter, 1)
    scalars[f"intermediate_loss_{i}"] = c + h + v
  scalars["loss"] = loss
  return loss, scalars
