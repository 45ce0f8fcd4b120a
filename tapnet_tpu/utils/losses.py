"""Losses for TAP-family training.

Reference behavior: tapnet/utils/model_utils.py:29-174 (Huber position loss,
uncertainty ("expected_dist") BCE, occlusion BCE; points rescaled to 256x256
by convention before the loss).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from tapnet_tpu.utils import transforms

Array = jnp.ndarray


def sigmoid_binary_cross_entropy(logits: Array, labels: Array) -> Array:
  """Numerically-stable sigmoid BCE (same form optax uses)."""
  log_p = jax.nn.log_sigmoid(logits)
  log_not_p = jax.nn.log_sigmoid(-logits)
  return -labels * log_p - (1.0 - labels) * log_not_p


def huber_loss(
    tracks: Array,
    target_points: Array,
    occluded: Array,
    delta: float = 4.0,
    reduction_axes: Optional[Sequence[int]] = (1, 2),
) -> Array:
  """Huber loss on point trajectories, masked to visible points."""
  error = tracks - target_points
  distsqr = jnp.sum(jnp.square(error), axis=-1)
  dist = jnp.sqrt(distsqr + 1e-12)
  loss = jnp.where(dist < delta, distsqr / 2, delta * (dist - delta / 2))
  loss = loss * (1.0 - occluded)
  if reduction_axes:
    loss = jnp.mean(loss, axis=reduction_axes)
  return loss


def prob_loss(
    tracks: Array,
    expd: Array,
    target_points: Array,
    occluded: Array,
    expected_dist_thresh: float = 8.0,
    reduction_axes: Optional[Sequence[int]] = (1, 2),
) -> Array:
  """BCE on the model's self-estimate of being within threshold of target."""
  err = jnp.sum(jnp.square(tracks - target_points), axis=-1)
  invalid = (err > expected_dist_thresh**2).astype(expd.dtype)
  loss = sigmoid_binary_cross_entropy(expd, invalid)
  loss = loss * (1.0 - occluded)
  if reduction_axes:
    loss = jnp.mean(loss, axis=reduction_axes)
  return loss


def tapnet_loss(
    points: Array,
    occlusion: Array,
    target_points: Array,
    target_occ: Array,
    shape: Sequence[int],
    mask: Optional[Array] = None,
    expected_dist: Optional[Array] = None,
    position_loss_weight: float = 0.05,
    expected_dist_thresh: float = 6.0,
    huber_loss_delta: float = 4.0,
    rebalance_factor: Optional[float] = None,
    occlusion_loss_mask: Optional[Array] = None,
) -> Tuple[Array, Array, Array]:
  """Combined TAP loss: Huber position + occlusion BCE + uncertainty BCE.

  Points are rescaled to 256x256 before the loss (reference convention).

  Args:
    points: [B, N, T, 2] predicted (x, y) raster points.
    occlusion: [B, N, T] occlusion logits.
    target_points: same layout as points.
    target_occ: [B, N, T] binary occlusion targets.
    shape: [B, T, H, W, C] of the source video.
    mask: optional [B, N, T] inclusion mask.
    expected_dist: optional [B, N, T] uncertainty logits.
    position_loss_weight: weight of the position term.
    expected_dist_thresh: pixel threshold for the uncertainty target.
    huber_loss_delta: quadratic-to-linear crossover.
    rebalance_factor: visible points weighted (1 + factor) in occlusion BCE.
    occlusion_loss_mask: optional extra [B, N, T] mask on the occlusion term.

  Returns:
    (loss_huber, loss_occ, loss_prob) scalars.
  """
  if mask is None:
    mask = 1.0
  wh = tuple(shape)[3:1:-1]
  points = transforms.convert_grid_coordinates(points, wh, (256, 256))
  target_points = transforms.convert_grid_coordinates(
      target_points, wh, (256, 256)
  )

  loss_huber = (
      huber_loss(
          points,
          target_points,
          target_occ,
          delta=huber_loss_delta,
          reduction_axes=None,
      )
      * mask
  )
  loss_huber = jnp.mean(loss_huber) * position_loss_weight

  if expected_dist is None:
    loss_prob = jnp.asarray(0.0)
  else:
    loss_prob = (
        prob_loss(
            jax.lax.stop_gradient(points),
            expected_dist,
            target_points,
            target_occ,
            expected_dist_thresh,
            reduction_axes=None,
        )
        * mask
    )
    loss_prob = jnp.mean(loss_prob)

  target_occ = target_occ.astype(occlusion.dtype)
  loss_occ = sigmoid_binary_cross_entropy(occlusion, target_occ) * mask
  if rebalance_factor is not None:
    loss_occ = loss_occ * (
        (1 + rebalance_factor) - rebalance_factor * target_occ
    )
  if occlusion_loss_mask is not None:
    loss_occ = loss_occ * occlusion_loss_mask
  loss_occ = jnp.mean(loss_occ)

  return loss_huber, loss_occ, loss_prob
