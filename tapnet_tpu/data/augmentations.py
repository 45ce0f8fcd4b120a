"""Training augmentations, computed on device under jit.

Capability parity:
  * Color augmentation for TAPIR training (reference:
    tapnet/utils/experiment_utils.py:183-250 — TF brightness / saturation /
    contrast / hue each with p=0.8, grayscale with p=0.2) — here as pure
    jnp ops on the [-1, 1] video tensor.
  * TAPNext++ long-video roll and homography augmentations (reference:
    tapnet/tapnextpp/augmentations/{roll,homography}.py) — sinusoidal
    camera-jitter schedules; frames are warped on device by inverse bilinear
    sampling instead of per-frame cv2 calls, trajectories transformed with
    the same matrices.
"""

from __future__ import annotations

import functools
from typing import Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.utils import sampling

Array = jnp.ndarray


# ------------------------------------------------------------------ color aug


def _rgb_to_grayscale(video: Array) -> Array:
  lum = (
      0.2989 * video[..., 0]
      + 0.587 * video[..., 1]
      + 0.114 * video[..., 2]
  )
  return jnp.stack([lum] * 3, axis=-1)


def _rgb_to_hsv(rgb: Array) -> Array:
  r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
  maxc = jnp.max(rgb, axis=-1)
  minc = jnp.min(rgb, axis=-1)
  v = maxc
  delta = maxc - minc
  s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
  safe_delta = jnp.maximum(delta, 1e-12)
  rc = (maxc - r) / safe_delta
  gc = (maxc - g) / safe_delta
  bc = (maxc - b) / safe_delta
  h = jnp.where(
      maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
  )
  h = (h / 6.0) % 1.0
  h = jnp.where(delta == 0, 0.0, h)
  return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: Array) -> Array:
  h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
  i = jnp.floor(h * 6.0)
  f = h * 6.0 - i
  p = v * (1 - s)
  q = v * (1 - f * s)
  t = v * (1 - (1 - f) * s)
  i = i.astype(jnp.int32) % 6
  choices = jnp.stack(
      [
          jnp.stack([v, t, p], -1),
          jnp.stack([q, v, p], -1),
          jnp.stack([p, v, t], -1),
          jnp.stack([p, q, v], -1),
          jnp.stack([t, p, v], -1),
          jnp.stack([v, p, q], -1),
      ],
      axis=0,
  )
  return jnp.take_along_axis(
      choices, i[None, ..., None].astype(jnp.int32), axis=0
  )[0]


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def color_augmentation(
    rng: Array,
    video: Array,
    prob_color_augment: float = 0.8,
    prob_color_drop: float = 0.2,
    brightness_max_delta: float = 32.0 / 255.0,
    saturation_range: Tuple[float, float] = (0.6, 1.4),
    contrast_range: Tuple[float, float] = (0.6, 1.4),
    hue_max_delta: float = 0.2,
) -> Array:
  """Photometric jitter on a [-1, 1] video (same transform for all frames,
  matching the reference's per-video TF augmentation)."""
  keys = jax.random.split(rng, 7)
  x = video * 0.5 + 0.5  # to [0, 1]

  def augment(x):
    b = jax.random.uniform(
        keys[0], (), minval=-brightness_max_delta,
        maxval=brightness_max_delta,
    )
    x = jnp.clip(x + b, 0.0, 1.0)
    hsv = _rgb_to_hsv(x)
    sat = jax.random.uniform(
        keys[1], (), minval=saturation_range[0], maxval=saturation_range[1]
    )
    hue = jax.random.uniform(
        keys[2], (), minval=-hue_max_delta, maxval=hue_max_delta
    )
    hsv = jnp.stack(
        [
            (hsv[..., 0] + hue) % 1.0,
            jnp.clip(hsv[..., 1] * sat, 0.0, 1.0),
            hsv[..., 2],
        ],
        axis=-1,
    )
    x = jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)
    c = jax.random.uniform(
        keys[3], (), minval=contrast_range[0], maxval=contrast_range[1]
    )
    mean = jnp.mean(x, axis=(-2, -3), keepdims=True)
    return jnp.clip((x - mean) * c + mean, 0.0, 1.0)

  do_augment = jax.random.uniform(keys[4], ()) < prob_color_augment
  x = jnp.where(do_augment, augment(x), x)
  do_drop = jax.random.uniform(keys[5], ()) < prob_color_drop
  x = jnp.where(do_drop, _rgb_to_grayscale(x), x)
  return x * 2.0 - 1.0


# ------------------------------------------------------- geometric (TAPNext++)


def sinusoid_schedule(
    rng: np.random.RandomState,
    num_frames: int,
    n_low: int,
    n_high: int,
    low_amp: float,
    high_amp: float,
    strength: float = 1.0,
) -> np.ndarray:
  """Sum of random low/high-frequency sinusoids, zeroed at t=0. [T]."""
  t = np.arange(num_frames) / num_frames if num_frames > 1 else np.zeros(1)
  out = np.zeros(num_frames)
  for n, amp_max, freq_range in (
      (n_low, low_amp, (1, 4)),
      (n_high, high_amp, (8, 16)),
  ):
    amps = rng.uniform(0, amp_max, n) * strength
    freqs = rng.uniform(*freq_range, n) * np.pi
    phases = rng.uniform(0, 2 * np.pi, n)
    for a, f, p in zip(amps, freqs, phases):
      out += a * (np.sin(t * f + p) - np.sin(p))
  return out


@jax.jit
def warp_video(video: Array, homogs: Array) -> Array:
  """Inverse-warp each frame by its homography (device-side bilinear).

  Args:
    video: [T, H, W, C].
    homogs: [T, 3, 3] mapping source pixel centers -> destination pixels.

  Returns:
    warped [T, H, W, C] with zero padding outside.
  """
  t, h, w, c = video.shape
  ys = jnp.arange(h, dtype=jnp.float32)
  xs = jnp.arange(w, dtype=jnp.float32)
  gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
  dest = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(h * w)], axis=-1)

  inv = jnp.linalg.inv(homogs)  # dest -> source

  def warp_frame(frame, m):
    src = dest @ m.T
    src = src[:, :2] / jnp.where(
        jnp.abs(src[:, 2:]) < 1e-12, 1e-12, src[:, 2:]
    )
    # Convert pixel-index coords to raster (+0.5) for the sampler.
    pts_yx = jnp.stack([src[:, 1] + 0.5, src[:, 0] + 0.5], axis=-1)
    vals = sampling.sample_grid_2d(frame, pts_yx, mode="constant")
    return vals.reshape(h, w, c)

  return jax.vmap(warp_frame)(video, inv)


@jax.jit
def warp_video_u8(video_u8: Array, homogs: Array) -> Array:
  """`warp_video` with uint8 in/out and the float conversion done on device.

  For host-side data pipelines feeding a remote accelerator this moves 4x
  less data each way than shipping float32 frames, and one composed warp
  replaces chained per-augmentation warps (see
  `kubric.geometric_augmentation`).
  """
  warped = warp_video(video_u8.astype(jnp.float32), homogs)
  return jnp.clip(jnp.round(warped), 0.0, 255.0).astype(jnp.uint8)


def compose_homographies(*stacks: np.ndarray) -> np.ndarray:
  """Compose per-frame homography stacks; stacks[0] is applied LAST.

  `warp_video` + `transform_points` apply x_new = H @ x_old, so applying
  R then M equals one application of (M @ R):
  compose_homographies(M, R) == M @ R per frame.
  """
  out = stacks[0]
  for nxt in stacks[1:]:
    out = np.einsum("tij,tjk->tik", out, nxt)
  return out


def transform_points(homogs: np.ndarray, points_xy: np.ndarray) -> np.ndarray:
  """Apply per-frame homographies to [T, N, 2] (x, y) points."""
  pts_h = np.concatenate(
      [points_xy, np.ones_like(points_xy[..., :1])], axis=-1
  )
  out = np.einsum("tij,tnj->tni", homogs, pts_h)
  return out[..., :2] / np.where(
      np.abs(out[..., 2:]) < 1e-12, 1e-12, out[..., 2:]
  )


def _reflect(val, lo, hi):
  while val < lo or val > hi:
    if val < lo:
      val = lo + (lo - val)
    if val > hi:
      val = hi - (val - hi)
  return val


class RollAugmentation:
  """Sinusoidal camera shift + in-plane rotation over time.

  data dict: {"video" [T, H, W, C] (any float range), "tracks" [T, N, 2]
  (x, y) raster}. The rotation is applied as a per-frame affine homography
  warped on device.
  """

  def __init__(self, rotate: bool = True, p: float = 0.8,
               strength: float = 1.0, seed: Optional[int] = None):
    self.rotate = rotate
    self.p = p
    self.strength = strength
    self.rng = np.random.RandomState(seed)

  def sample_homographies(
      self, t: int, h: int, w: int
  ) -> Optional[np.ndarray]:
    """Draw this augmentation's per-frame matrices, or None when skipped."""
    if self.rng.rand() > self.p:
      return None
    shift_x = sinusoid_schedule(self.rng, t, 5, 5, 30.0, 10.0, self.strength)
    shift_y = sinusoid_schedule(self.rng, t, 5, 5, 20.0, 7.0, self.strength)
    angle = (
        sinusoid_schedule(self.rng, t, 5, 5, 10.0, 5.0, self.strength)
        if self.rotate
        else np.zeros(t)
    )

    # Build per-frame affine homographies: rotate about center, then shift.
    homogs = np.zeros((t, 3, 3))
    cx, cy = w / 2.0, h / 2.0
    rad = np.deg2rad(angle)
    cos, sin = np.cos(rad), np.sin(rad)
    for i in range(t):
      rot = np.array(
          [
              [cos[i], sin[i], (1 - cos[i]) * cx - sin[i] * cy],
              [-sin[i], cos[i], sin[i] * cx + (1 - cos[i]) * cy],
              [0, 0, 1],
          ]
      )
      shift = np.array(
          [[1, 0, shift_x[i]], [0, 1, shift_y[i]], [0, 0, 1]]
      )
      homogs[i] = rot @ shift
    return homogs

  def __call__(self, data: Mapping[str, np.ndarray]):
    video = np.asarray(data["video"])
    t, h, w = video.shape[:3]
    homogs = self.sample_homographies(t, h, w)
    if homogs is None:
      return dict(data)
    return _apply_homographies(data, homogs)


class HomographyAugmentation:
  """Sinusoidal perspective jitter: the four frame corners wander smoothly
  within 30% margins; frames are warped by the induced homographies."""

  def __init__(self, p: float = 0.8, strength: float = 1.0,
               seed: Optional[int] = None):
    self.p = p
    self.strength = strength
    self.rng = np.random.RandomState(seed)

  def sample_homographies(
      self, t: int, h: int, w: int
  ) -> Optional[np.ndarray]:
    """Draw this augmentation's per-frame matrices, or None when skipped."""
    if self.rng.rand() > self.p:
      return None

    # 8 schedules: (x, y) for each of 4 corners.
    perts = np.stack(
        [
            sinusoid_schedule(self.rng, t, 3, 3, 0.05, 0.02, self.strength)
            for _ in range(8)
        ],
        axis=1,
    )  # [T, 8]
    signs = np.array([1, 1, -1, 1, -1, -1, 1, -1])
    scale = np.array([w, h, w, h, w, h, w, h])
    perts = np.abs(perts) * signs * scale

    src = np.array(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float64
    )
    homogs = np.zeros((t, 3, 3))
    wm, hm = w * 0.3, h * 0.3
    bounds = [
        (0, wm), (0, hm),
        (w - 1 - wm, w - 1), (0, hm),
        (w - 1 - wm, w - 1), (h - 1 - hm, h - 1),
        (0, wm), (h - 1 - hm, h - 1),
    ]
    from tapnet_tpu.utils import viz

    for i in range(t):
      dst = src.reshape(-1) + perts[i]
      dst = np.array(
          [_reflect(v, lo, hi) for v, (lo, hi) in zip(dst, bounds)]
      ).reshape(4, 2)
      homogs[i] = np.asarray(viz.estimate_homography(dst, src))
      homogs[i] /= homogs[i][2, 2]
    return homogs

  def __call__(self, data: Mapping[str, np.ndarray]):
    video = np.asarray(data["video"])
    t, h, w = video.shape[:3]
    homogs = self.sample_homographies(t, h, w)
    if homogs is None:
      return dict(data)
    return _apply_homographies(data, homogs)


def _apply_homographies(
    data: Mapping[str, np.ndarray], homogs: np.ndarray
):
  """Warp data["video"] and transform data["tracks"] by per-frame matrices."""
  video = np.asarray(data["video"])
  tracks = np.asarray(data["tracks"])
  warped = np.asarray(warp_video(jnp.asarray(video), jnp.asarray(homogs)))
  new_tracks = transform_points(homogs, tracks)
  return dict(data, video=warped, tracks=new_tracks.astype(tracks.dtype))
