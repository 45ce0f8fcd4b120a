"""Kubric-format training data ingest.

The reference trains on the external Kubric MOVi point-tracking TFDS
(training/experiment.py:263). This module consumes pre-exported Kubric
examples as npz files — one per example, with:

  video          [T, H, W, 3] uint8
  target_points  [N, T, 2] (x, y) raster at video resolution
  occluded       [N, T] bool
  (optional) query_points [N, 3] (t, y, x); sampled from the tracks if absent

Host work is limited to mmap'd npz reads; resize-to-train-resolution,
normalization, query sampling, and color augmentation run on device under
jit (the reference does all of this in a host-side TF pipeline).
"""

from __future__ import annotations

import functools
import glob
import os
import threading
import queue as queue_lib
from typing import Iterator, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tapnet_tpu.data import augmentations
from tapnet_tpu.utils import transforms

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def prepare_batch(
    rng: Array,
    batch: Mapping[str, Array],
    train_size: Tuple[int, int] = (256, 256),
    num_queries: int = 256,
    color_augment: bool = True,
) -> Mapping[str, Array]:
  """Device-side: resize, normalize, sample visible queries, color-augment.

  batch: video uint8 [B, T, H, W, 3]; target_points [B, N, T, 2];
  occluded [B, N, T].
  """
  video = batch["video"].astype(jnp.float32) / 255.0 * 2.0 - 1.0
  b, t, h, w, _ = video.shape
  if (h, w) != tuple(train_size):
    video = jax.image.resize(
        video, (b, t) + tuple(train_size) + (3,), "bilinear"
    )
  target_points = transforms.convert_grid_coordinates(
      batch["target_points"], (w, h), train_size[::-1]
  )
  occluded = batch["occluded"].astype(jnp.float32)

  # Sample query points: a random visible (track, frame) pair per query.
  def sample_one(rng, pts, occ):
    n, t = occ.shape
    k1, k2 = jax.random.split(rng)
    visible = 1.0 - occ
    # Weight tracks by visibility so fully-occluded tracks are avoided.
    track_w = visible.sum(-1) + 1e-6
    tracks = jax.random.choice(
        k1, n, (num_queries,), p=track_w / track_w.sum()
    )
    frame_logits = jnp.where(visible[tracks] > 0, 0.0, -1e9)
    frames = jax.random.categorical(k2, frame_logits, axis=-1)
    xy = pts[tracks, frames]  # (x, y)
    qp = jnp.stack(
        [frames.astype(jnp.float32), xy[:, 1], xy[:, 0]], axis=-1
    )
    return qp, pts[tracks], occ[tracks]

  rngs = jax.random.split(rng, b + 1)
  qp, tp, occ = jax.vmap(sample_one)(rngs[1:], target_points, occluded)

  if color_augment:
    video = jax.vmap(augmentations.color_augmentation)(
        jax.random.split(rngs[0], b), video
    )

  return {
      "video": video,
      "query_points": qp,
      "target_points": tp,
      "occluded": occ,
  }


class KubricNpzReader:
  """Double-buffered host reader over a directory of Kubric npz examples.

  `example_transform`, if given, maps one loaded example dict (video
  [T, H, W, 3], target_points [N, T, 2], occluded [N, T]) to another —
  the hook for per-example geometric augmentation (TAPNext++ roll /
  homography, reference tapnet/tapnextpp/augmentations/)."""

  def __init__(
      self,
      data_dir: str,
      batch_size: int,
      seed: int = 0,
      prefetch: int = 2,
      example_transform=None,
  ):
    self.paths = sorted(glob.glob(os.path.join(data_dir, "*.npz")))
    if not self.paths:
      raise ValueError(f"No npz files in {data_dir}")
    self.batch_size = batch_size
    self.rng = np.random.RandomState(seed)
    self.example_transform = example_transform
    self._queue: queue_lib.Queue = queue_lib.Queue(maxsize=prefetch)
    self._thread = threading.Thread(target=self._worker, daemon=True)
    self._thread.start()

  def _load(self, path: str) -> Mapping[str, np.ndarray]:
    with np.load(path) as z:
      example = {
          "video": z["video"],
          "target_points": z["target_points"],
          "occluded": z["occluded"],
      }
    if self.example_transform is not None:
      example = self.example_transform(example)
    return example

  def _worker(self):
    while True:
      idx = self.rng.randint(0, len(self.paths), self.batch_size)
      examples = [self._load(self.paths[i]) for i in idx]
      batch = {
          k: np.stack([e[k] for e in examples]) for k in examples[0]
      }
      self._queue.put(batch)

  def __iter__(self):
    return self

  def __next__(self) -> Mapping[str, np.ndarray]:
    return self._queue.get()


def geometric_augmentation(seed: int = 0, strength: float = 1.0):
  """Per-example TAPNext++ roll + homography augmentation transform.

  The reference applies sinusoidal camera roll and perspective jitter when
  fine-tuning TAPNext++ on long clips (tapnet/tapnextpp/augmentations/
  {roll,homography}.py). Returns an `example_transform` for KubricNpzReader:
  it adapts between the Kubric layout (target_points [N, T, 2], uint8 video)
  and the augmentations' {"video", "tracks" [T, N, 2]} dict, warping frames
  on device and transforming trajectories with the same homographies.
  Occlusion flags are kept as-is (points warped outside the frame are
  handled by the loss's visibility weighting, as in the reference).

  The two augmentations' per-frame matrices are COMPOSED and the video is
  warped once, in uint8 (`augmentations.warp_video_u8`): one resampling pass
  instead of two (less blur), and 12x less host<->device traffic than the
  chained float32 warps on a 1024-frame clip — the chained path measured
  8-15 min/example through a remote-device tunnel (PERFORMANCE.md r5).
  """
  roll = augmentations.RollAugmentation(seed=seed, strength=strength)
  homog = augmentations.HomographyAugmentation(
      seed=seed + 1, strength=strength
  )

  def transform(example):
    video = np.asarray(example["video"])
    t, h, w = video.shape[:3]
    # Keep the draw order (roll first) so RNG streams match the chained path.
    stacks = [
        m
        for m in (
            roll.sample_homographies(t, h, w),
            homog.sample_homographies(t, h, w),
        )
        if m is not None
    ]
    if not stacks:
      return dict(example)
    # Roll applies first, homography second: compose H_homog @ H_roll.
    composed = augmentations.compose_homographies(*reversed(stacks))
    if np.issubdtype(video.dtype, np.floating):
      video = np.clip(np.round(video), 0, 255).astype(np.uint8)
    warped = np.asarray(
        augmentations.warp_video_u8(jnp.asarray(video), jnp.asarray(composed))
    )
    tracks = np.transpose(
        np.asarray(example["target_points"], np.float32), (1, 0, 2)
    )
    new_tracks = augmentations.transform_points(composed, tracks)
    return dict(
        example,
        video=warped,
        target_points=np.transpose(new_tracks, (1, 0, 2)).astype(np.float32),
    )

  return transform


def training_iterator(
    data_dir: str,
    batch_size: int,
    train_size: Tuple[int, int] = (256, 256),
    num_queries: int = 256,
    color_augment: bool = True,
    geometric_augment: bool = False,
    seed: int = 0,
) -> Iterator[Mapping[str, Array]]:
  """Host reads + device-side preparation, ready for Trainer.fit."""
  reader = KubricNpzReader(
      data_dir,
      batch_size,
      seed=seed,
      example_transform=(
          geometric_augmentation(seed=seed) if geometric_augment else None
      ),
  )
  rng = jax.random.PRNGKey(seed)
  for batch in reader:
    rng, key = jax.random.split(rng)
    yield prepare_batch(
        key,
        jax.tree_util.tree_map(jnp.asarray, batch),
        train_size,
        num_queries,
        color_augment,
    )
